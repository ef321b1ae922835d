package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MatrixOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query
  * over the driver testdata, with equivalent ANSI SQL for the DuckDB
  * oracle. Matrix inputs are derived arithmetically from `lineitem`
  * (SURVEY §7 R1) and keep integral-valued doubles so sums are
  * association-insensitive across engines (R2).
  */
object SparkEntry {

  /** Matrix dimension for the oracle-checked matmul family. */
  private val N = 64L
  /** Sparsity stride for the sparse variant (≈5% density — mirrors the
    * reference's default `--density 0.05`, `mm_opt.py:119`). */
  private val SparseStride = 20L

  // --- Spark-side canonical matrix derivations (FIXTURES.md §A) ---------

  /** A: dense-ish coordinate matrix from lineitem (duplicates pre-summed,
    * SURVEY Q3). */
  private def matA(s: SparkSession, dir: String): DataFrame =
    MatrixOps.fromTable(Tables.lineitem(s, dir),
      col("l_orderkey") % N, col("l_partkey") % N, col("l_quantity"))

  /** B: independent derivation (different column pairing). */
  private def matB(s: SparkSession, dir: String): DataFrame =
    MatrixOps.fromTable(Tables.lineitem(s, dir),
      col("l_partkey") % N, col("l_suppkey") % N, col("l_linenumber"))

  /** Sparse A (~5% of cells) — the CSR analog (`mm_opt.py:10-28`). */
  private def matASparse(s: SparkSession, dir: String): DataFrame =
    matA(s, dir).filter((col("i") + col("j")) % SparseStride === 0)

  private def ordered(df: DataFrame): DataFrame = df.orderBy("i", "j")

  // --- DuckDB-side oracle text for the same derivations ----------------

  private val sqlA =
    s"SELECT l_orderkey % $N AS i, l_partkey % $N AS j, SUM(l_quantity) AS v FROM lineitem GROUP BY 1, 2"
  private val sqlB =
    s"SELECT l_partkey % $N AS i, l_suppkey % $N AS j, SUM(CAST(l_linenumber AS DOUBLE)) AS v FROM lineitem GROUP BY 1, 2"
  private val sqlASparse =
    s"SELECT * FROM a0 WHERE (i + j) % $SparseStride = 0"

  private def sqlMultiply(aCte: String, bCte: String): String =
    s"""WITH a0 AS ($sqlA), b0 AS ($sqlB), a AS ($aCte), b AS ($bCte)
       |SELECT a.i AS i, b.j AS j, SUM(a.v * b.v) AS v
       |FROM a JOIN b ON a.j = b.i
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val sqlMatmul = sqlMultiply("SELECT * FROM a0", "SELECT * FROM b0")

  // ---------------------------------------------------------------------

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    ordered(MatrixOps.multiply(matA(spark, dir), matB(spark, dir)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — matmul_basic (mm_baseline.py:17-28 / mm_baseline.c:40-52 /
    // MMBaseline.java:30-42): join on contraction index + grouped sum.
    "matmul_basic" -> ((s, dir) =>
      ordered(MatrixOps.multiply(matA(s, dir), matB(s, dir)))),

    // M2 — matmul_transposed (mm_opt.py:42-55): same result via the
    // pre-transposed right side; transpose is a projection.
    "matmul_transposed" -> ((s, dir) =>
      ordered(MatrixOps.multiplyTransposed(matA(s, dir),
        MatrixOps.transpose(matB(s, dir))))),

    // M3 — matmul_blocked (mm_opt.c:63-78): BlockMatrix tiled path,
    // BS=16 blocks over the 64×64 derivation (reference default BS=64,
    // --block knob surfaced as the blockSize parameter).
    "matmul_blocked" -> ((s, dir) =>
      ordered(MatrixOps.multiplyBlocked(s, matA(s, dir), matB(s, dir), N, 16))),

    // M4/M7 — spmm: sparse A × dense B with the dense side broadcast
    // (mm_opt.c:112-120; replicate-B plan of mm_opt_par.py:26-41).
    "spmm_sparse" -> ((s, dir) =>
      ordered(MatrixOps.multiply(matASparse(s, dir), matB(s, dir),
        broadcastRight = true))),

    // A × I = A — identity property as an oracle-checkable query.
    "matmul_identity" -> ((s, dir) =>
      ordered(MatrixOps.multiply(matA(s, dir), MatrixOps.identity(s, N),
        broadcastRight = true))),

    // Q2 — Stage 3 multiplies a matrix by itself (mm_opt_par.py:60-61,
    // MMOptPar.java:83: A and B share a seed): the A=B case.
    "matmul_square" -> ((s, dir) =>
      ordered(MatrixOps.multiply(matA(s, dir), matA(s, dir)))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "matmul_basic" -> sqlMatmul,
    "matmul_transposed" -> sqlMatmul,
    "matmul_blocked" -> sqlMatmul,
    "spmm_sparse" -> sqlMultiply(sqlASparse, "SELECT * FROM b0"),
    "matmul_identity" ->
      s"WITH a0 AS ($sqlA) SELECT i, j, v FROM a0 ORDER BY 1, 2",
    "matmul_square" -> sqlMultiply("SELECT * FROM a0", "SELECT * FROM a0"),
  )
}
