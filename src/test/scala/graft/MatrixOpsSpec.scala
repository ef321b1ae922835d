package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MatrixOps

/** Correctness of the coordinate-matrix algebra (FIXTURES.md §B.1/§B.4).
  *
  * The reference never checks its computed C (SURVEY.md §5 — discarded
  * unchecked in all three languages); these tests assert the equivalences
  * its four kernels implicitly claim: basic ≡ transposed ≡ blocked, A×I=A,
  * (A×B)ᵀ=Bᵀ×Aᵀ, and duplicate-coordinate accumulation (SURVEY Q3).
  */
class MatrixOpsSpec extends SparkSpec {

  private def mat(entries: (Long, Long, Double)*): DataFrame = {
    import spark.implicits._
    entries.toDF("i", "j", "v")
  }

  // Hand-computed 2×2 golden product: [[1,2],[3,4]]·[[5,6],[7,8]].
  private def A = mat((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0))
  private def B = mat((0, 0, 5.0), (0, 1, 6.0), (1, 0, 7.0), (1, 1, 8.0))
  private val golden = Seq(
    (0L, 0L, 19.0), (0L, 1L, 22.0), (1L, 0L, 43.0), (1L, 1L, 50.0))

  test("multiply matches the hand-computed 2x2 golden product") {
    assert(cells(MatrixOps.multiply(A, B)) === golden)
  }

  test("multiply with broadcastRight yields the same result") {
    assert(cells(MatrixOps.multiply(A, B, broadcastRight = true)) === golden)
  }

  test("multiplyTransposed(A, B-transposed) equals multiply(A, B)") {
    val bt = MatrixOps.transpose(B)
    assert(cells(MatrixOps.multiplyTransposed(A, bt)) === golden)
  }

  test("multiplyBlocked equals multiply on an integral random matrix") {
    // Integral values so block-wise and row-wise summation orders agree
    // bit-for-bit (SURVEY §7 R2/R3).
    def intify(m: DataFrame) = m.withColumn("v", floor(col("v") * 10).cast("double"))
    val a = intify(MatrixOps.genDense(spark, 24, seed = 1))
    val b = intify(MatrixOps.genSparse(spark, 24, density = 0.3, seed = 2))
    val viaJoin = cells(MatrixOps.multiply(a, b)).filter(_._3 != 0.0)
    val viaBlocks = cells(MatrixOps.multiplyBlocked(spark, a, b, 24, blockSize = 8))
    assert(viaBlocks === viaJoin)
  }

  test("3x3 golden product (FIXTURES B.1)") {
    // [[1,2,3],[4,5,6],[7,8,9]] · [[9,8,7],[6,5,4],[3,2,1]]
    val a3 = mat((0, 0, 1.0), (0, 1, 2.0), (0, 2, 3.0),
      (1, 0, 4.0), (1, 1, 5.0), (1, 2, 6.0),
      (2, 0, 7.0), (2, 1, 8.0), (2, 2, 9.0))
    val b3 = mat((0, 0, 9.0), (0, 1, 8.0), (0, 2, 7.0),
      (1, 0, 6.0), (1, 1, 5.0), (1, 2, 4.0),
      (2, 0, 3.0), (2, 1, 2.0), (2, 2, 1.0))
    assert(cells(MatrixOps.multiply(a3, b3)) === Seq(
      (0L, 0L, 30.0), (0L, 1L, 24.0), (0L, 2L, 18.0),
      (1L, 0L, 84.0), (1L, 1L, 69.0), (1L, 2L, 54.0),
      (2L, 0L, 138.0), (2L, 1L, 114.0), (2L, 2L, 90.0)))
  }

  test("zero matrix annihilates (FIXTURES B.1)") {
    // coordinate form: the zero matrix stores nothing — empty DF
    val zero = mat().select(col("i"), col("j"), col("v"))
    assert(cells(MatrixOps.multiply(A, zero)).isEmpty)
    assert(cells(MatrixOps.multiply(zero, A)).isEmpty)
  }

  test("A x I = A") {
    val a = mat((0, 1, 2.0), (2, 3, 5.0), (3, 0, 7.0))
    val out = cells(MatrixOps.multiply(a, MatrixOps.identity(spark, 4)))
    assert(out === Seq((0L, 1L, 2.0), (2L, 3L, 5.0), (3L, 0L, 7.0)))
  }

  test("(A x B) transposed = B-transposed x A-transposed") {
    val lhs = cells(MatrixOps.transpose(MatrixOps.multiply(A, B)))
    val rhs = cells(MatrixOps.multiply(MatrixOps.transpose(B), MatrixOps.transpose(A)))
    assert(lhs === rhs)
  }

  test("fromTable accumulates duplicate coordinates (SURVEY Q3)") {
    import spark.implicits._
    // The reference's C/Java CSR generators can emit the same (i,j) twice
    // and spmm adds both contributions (mm_opt.c:99-120, MMOpt.java:105-110).
    val raw = Seq((1L, 1L, 2.0), (1L, 1L, 3.0), (0L, 1L, 4.0)).toDF("a", "b", "x")
    val m = MatrixOps.fromTable(raw, col("a"), col("b"), col("x"))
    assert(cells(m) === Seq((0L, 1L, 4.0), (1L, 1L, 5.0)))
  }

  test("genSparse keeps roughly density * n^2 cells") {
    val n = 50L
    val count = MatrixOps.genSparse(spark, n, 0.1, seed = 7).count()
    assert(count > n * n * 0.05 && count < n * n * 0.2)
  }

  test("square case A x A (Stage-3 Q2 semantics) matches itself") {
    val viaSelf = cells(MatrixOps.multiply(A, A))
    assert(viaSelf === Seq((0L, 0L, 7.0), (0L, 1L, 10.0), (1L, 0L, 15.0), (1L, 1L, 22.0)))
  }
}
