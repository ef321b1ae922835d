package graft

import graft.operators.MatrixOps

/** Physical-variant equivalences: salting and chaining must be
  * bit-identical to the plain join path. */
class MatrixScaleSpec extends SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def randMat(n: Long, seed: Long) = {
    import org.apache.spark.sql.functions.floor
    MatrixOps.genDense(spark, n, seed)
      .withColumn("v", floor(col("v") * 10).cast("double"))
  }

  test("salted multiply equals plain multiply (skew mitigation is physical)") {
    val a = randMat(12, 3)
    val b = randMat(12, 4)
    assert(cells(MatrixOps.multiplySalted(a, b, salt = 4)) ===
      cells(MatrixOps.multiply(a, b)))
  }

  test("salted multiply survives an actually skewed matrix") {
    // all of A's mass in one contraction column — the hot-key case
    val a = Seq.tabulate(50)(i => (i.toLong, 0L, 1.0)).toDF("i", "j", "v")
    val b = Seq((0L, 0L, 2.0), (0L, 1L, 3.0)).toDF("i", "j", "v")
    val out = cells(MatrixOps.multiplySalted(a, b, salt = 4))
    assert(out.length === 100) // 50 rows × 2 cols
    assert(out.forall(c => c._3 === (if (c._2 == 0L) 2.0 else 3.0)))
  }

  test("power(a, 1) is a and power(a, 3) associates correctly") {
    val a = randMat(8, 5)
    assert(cells(MatrixOps.power(a, 1)) === cells(a))
    val viaPower = cells(MatrixOps.power(a, 3))
    val manual = cells(MatrixOps.multiply(MatrixOps.multiply(a, a), a))
    assert(viaPower === manual)
  }
}
