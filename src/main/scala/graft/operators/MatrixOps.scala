package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed matrix algebra over coordinate-form DataFrames.
  *
  * A matrix is a DataFrame with columns `(i: BIGINT, j: BIGINT, v: DOUBLE)`
  * holding the stored (generally nonzero) cells. This is the engine's
  * canonical form for BOTH the reference's dense `double[n][n]` matrices
  * (`Stage 1/C Implementation/mm_baseline.c:21-29`, `Stage 1/Java
  * Implementation/MMBaseline.java:19-21`) and its CSR sparse matrices
  * (`Stage 2/Python Implementation/mm_opt.py:10-28`, `Stage 2/C
  * Implementation/mm_opt.c:81`): at the 100 TB scale the assignment PDF's
  * Stage 4 demands ("matrices that cannot fit into the memory of a single
  * machine"), a dense array representation is impossible and CSR's
  * skip-the-zeros trick is exactly what a coordinate relation does by
  * construction.
  *
  * Multiplication `C[i,j] = Σ_k A[i,k]·B[k,j]` (the triple loop at
  * `Stage 1/Python Implementation/mm_baseline.py:17-28`) is an equi-join on
  * the contraction index followed by a grouped sum — Catalyst then owns the
  * physical strategy (sort-merge vs broadcast-hash, partial aggregation,
  * AQE skew splitting), which subsumes the reference's hand-built loop-order
  * / tiling / threading variants (SURVEY.md §4).
  *
  * Scale notes (local[32] today, 1000 executors tomorrow):
  *   - `fromTable` pre-aggregates duplicate coordinates BEFORE the join:
  *     correct per the reference's accumulate semantics (SURVEY Q3,
  *     `Stage 2/C Implementation/mm_opt.c:112-120`) and shrinks the shuffle
  *     to ≤ n² rows per side.
  *   - `multiply` shuffles both sides by the contraction key, then the
  *     grouped sum gets map-side partial aggregation for free. Partial
  *     products never materialize beyond the aggregation hash maps.
  *   - For sparse × small-dense (SpMM, `mm_opt.c:112-120`) pass
  *     `broadcastRight = true`: it is precisely the reference's Stage-3
  *     Python plan — chunk A across workers, replicate B to each
  *     (`Stage 3/Python Implementation/mm_opt_par.py:26-41`) — as a
  *     broadcast-hash join with zero shuffle on the big side.
  */
object MatrixOps {

  /** Derive a coordinate matrix from a relational table.
    *
    * Deterministic arithmetic over existing columns replaces the
    * reference's seeded RNG fills (`mm_baseline.py:13-15`, `mm_opt.c:24`,
    * `MMBaseline.java:23-28`) so that external engines (the DuckDB oracle)
    * reproduce bit-identical values — the reference itself could never
    * compare results across its three languages because each used a
    * different RNG (SURVEY.md §5). Duplicate (i,j) contributions accumulate
    * (SURVEY Q3), hence the groupBy-sum.
    */
  def fromTable(df: DataFrame, i: Column, j: Column, v: Column): DataFrame =
    df.select(i.cast("long").as("i"), j.cast("long").as("j"), v.cast("double").as("v"))
      .groupBy("i", "j").agg(sum("v").as("v"))

  /** n×n identity. Generated distributed (`spark.range` parallelizes). */
  def identity(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("i"), col("id").as("j"), lit(1.0).as("v"))

  /** Dense n×n generator — the engine form of `gen_matrix`/`fill*`
    * (`mm_baseline.py:13-15`, `mm_baseline.c:31-38`, `MMBaseline.java:23-28`).
    * Seeded `rand` matches the reference's "statistical shape only"
    * contract: no two of its languages ever agreed on values either.
    */
  def genDense(spark: SparkSession, n: Long, seed: Long): DataFrame =
    spark.range(n * n).select(
      // integer div, not double `/`: double rounding near 2^53 would
      // misassign row indices at extreme n
      expr(s"id div $n").as("i"),
      (col("id") % n).as("j"),
      rand(seed).as("v"))

  /** Sparse generator mirroring `gen_sparse_csr` (`mm_opt.py:10-28`):
    * ≈ density·n² stored cells, spread per-row like the reference's
    * per-row quota. Deterministic stride instead of `rnd.sample` so the
    * same cells exist on every engine/run.
    */
  def genSparse(spark: SparkSession, n: Long, density: Double, seed: Long): DataFrame = {
    val stride = math.max(1L, math.round(1.0 / density))
    genDense(spark, n, seed)
      .filter(((col("i") * 31L + col("j") + lit(seed)) % stride) === 0)
  }

  /** G5 exact-quota parity: the reference's CSR generator distributes
    * nnz = ⌊n²·density⌋ as `per_row = nnz / n` per row with one extra for
    * the first `nnz % n` rows (`mm_opt.py:17-18`, `mm_opt.c:86-87`,
    * `MMOpt.java:97`). Column positions come from a per-row deterministic
    * stride (distinct within a row — the Python generator's sorted
    * `rnd.sample` contract) instead of RNG, values from seeded `rand`.
    * Fully distributed: `range(n)` → per-row sequence explode, no driver
    * materialization at any n.
    */
  def genSparseQuota(spark: SparkSession, n: Long, density: Double,
                     seed: Long): DataFrame = {
    val nnz = (n * n * density).toLong
    val perRow = nnz / n
    val leftover = nnz % n
    spark.range(n)
      .select(col("id").as("i"),
        (lit(perRow) + when(col("id") < leftover, 1L).otherwise(0L)).as("k"))
      .filter(col("k") > 0)
      .withColumn("stride", greatest(lit(1L), (lit(n) / col("k")).cast("long")))
      .select(col("i"),
        explode(sequence(lit(0L), col("k") - 1)).as("t"),
        col("stride"))
      .select(col("i"), ((col("i") + col("t") * col("stride")) % n).as("j"))
      .withColumn("v", rand(seed))
  }

  /** C = A × B: equi-join on the contraction index k (= A.j = B.i), then
    * grouped sum — `matmul_basic` (`mm_baseline.py:17-28`, `mm_baseline.c:40-52`,
    * `MMBaseline.java:30-42`) and, unchanged, `spmm_csr_dense`
    * (`mm_opt.py:75-89`): a coordinate relation only stores nnz, so the
    * sparse kernel IS the dense kernel here.
    *
    * `broadcastRight` replicates B to every task (no shuffle of A) — the
    * plan of `parallel_mul` (`mm_opt_par.py:26-41`, whole-B-per-worker).
    */
  def multiply(a: DataFrame, b: DataFrame, broadcastRight: Boolean = false): DataFrame = {
    val probe = a.select(col("i"), col("j").as("k"), col("v").as("va"))
    val build0 = b.select(col("i").as("k"), col("j"), col("v").as("vb"))
    val build = if (broadcastRight) broadcast(build0) else build0
    probe.join(build, "k")
      .groupBy("i", "j")
      .agg(sum(col("va") * col("vb")).as("v"))
  }

  /** Bᵀ — a pure projection: the reference materializes a transposed copy
    * for cache locality (`mm_opt.c:49-61`); in coordinate form it is a
    * column swap with zero data movement.
    */
  def transpose(m: DataFrame): DataFrame =
    m.select(col("j").as("i"), col("i").as("j"), col("v"))

  /** `matmul_transposed` (`mm_opt.py:42-55`, `MMOpt.java:44-62`): compute
    * C = A × B given BT = Bᵀ. The i-j-k dot-product loop order is a
    * physical detail Catalyst owns; logically it is the same join with the
    * contraction on BT's j.
    */
  def multiplyTransposed(a: DataFrame, bt: DataFrame, broadcastRight: Boolean = false): DataFrame =
    multiply(a, transpose(bt), broadcastRight)

  /** A^k by left-to-right chaining. Chained multiplies reuse the
    * contraction-key partitioning: each product is already hash-
    * partitioned by (i, j) from its grouped sum, so re-keying by the next
    * contraction index is the only exchange between steps — the pattern
    * iterative algorithms (PageRank-style walks, reachability) hit at
    * scale. */
  def power(a: DataFrame, k: Int, broadcastRight: Boolean = false): DataFrame = {
    require(k >= 1, "power requires k >= 1")
    (2 to k).foldLeft(a)((acc, _) => multiply(acc, a, broadcastRight))
  }

  /** Boolean-semiring closure step: cap every stored cell at 1.0. Chained
    * with [[multiply]] this computes k-hop REACHABILITY instead of path
    * counts — and, critically for scale, keeps magnitudes at 1 so
    * iterated products can't overflow doubles the way raw path counts do
    * (count-explosion is why A^k over a web-scale graph is always run in
    * the boolean/tropical semiring, never the ring of reals).
    */
  def boolCap(m: DataFrame): DataFrame =
    m.withColumn("v", least(col("v"), lit(1.0)))

  /** k-hop reachability: capped A, k-1 capped multiplies. */
  def reachability(a: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    (2 to k).foldLeft(boolCap(a))((acc, _) => boolCap(multiply(acc, boolCap(a))))
  }

  /** Persist both operands bucketed on their contraction key so that
    * REPEATED multiplies (iterative solvers, chained products, A against
    * many B's) join with NO exchange at all: Spark's bucketed
    * sort-merge join reads co-located buckets directly. At 100 TB this
    * converts the per-iteration shuffle — the dominant cost — into a
    * one-time bucketed write. A is keyed by its column index j, B by its
    * row index i (the two sides of the contraction).
    */
  def saveForMultiply(a: DataFrame, b: DataFrame, aTable: String,
                      bTable: String, buckets: Int): Unit = {
    a.select(col("i"), col("j").as("k"), col("v").as("va"))
      .write.mode("overwrite")
      .bucketBy(buckets, "k").sortBy("k").saveAsTable(aTable)
    b.select(col("i").as("k"), col("j"), col("v").as("vb"))
      .write.mode("overwrite")
      .bucketBy(buckets, "k").sortBy("k").saveAsTable(bTable)
  }

  /** Multiply two matrices persisted with [[saveForMultiply]]: the join
    * consumes co-located buckets (no Exchange on either side — asserted
    * in BucketingSpec); only the final grouped sum shuffles. */
  def multiplyBucketed(spark: SparkSession, aTable: String,
                       bTable: String): DataFrame =
    spark.table(aTable).join(spark.table(bTable), "k")
      .groupBy("i", "j")
      .agg(sum(col("va") * col("vb")).as("v"))

  /** Skew-resistant multiply: when a few contraction keys dominate (a
    * dense column of A / row of B — the power-law case at 100 TB), a
    * plain hash join puts one key on one task. Salting splits each hot
    * A-key into `salt` shards and replicates the matching B rows across
    * shards, so the heavy key fans out over `salt` tasks. Same result as
    * [[multiply]] (property-tested); AQE skew-join does this adaptively,
    * this is the explicit form for when statistics are absent.
    */
  def multiplySalted(a: DataFrame, b: DataFrame, salt: Int): DataFrame = {
    val saltedA = a.select(col("i"), col("j").as("k"), col("v").as("va"),
      (pmod(hash(col("i")), lit(salt))).as("salt"))
    val saltedB = b.select(col("i").as("k"), col("j"), col("v").as("vb"))
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedA.join(saltedB, Seq("k", "salt"))
      .groupBy("i", "j")
      .agg(sum(col("va") * col("vb")).as("v"))
  }

  /** `matmul_blocked` (`mm_opt.py:57-73`, `mm_opt.c:63-78`, `MMOpt.java:64-82`):
    * the reference's 3-level cache tiling with block size BS as a
    * DataFrame-native SUMMA — cells densified into BS×BS row-major
    * blocks, one equi-join on the contraction BLOCK index, a primitive
    * ikj GEMM per block pair, then a skinny grouped sum across
    * contraction blocks. Same logical result as [[multiply]]; this is
    * the physical path for dense×dense at scale where per-cell
    * coordinate join cardinality (n³ partial-product ROWS) would
    * dominate: block form joins (n/BS)³ block pairs and keeps the n³
    * multiply-adds inside tight per-row array loops.
    *
    * Known asymmetry: a cell whose contraction cancels to EXACTLY 0.0 is
    * dropped here (indistinguishable from a never-touched cell of a dense
    * block) but kept by [[multiply]] (the join matched). Equivalent for
    * non-negative inputs — all of this engine's derivations — and only
    * reachable under sign cancellation.
    *
    * `n` bounds the index space (kept in the signature for parity with
    * the dense generators); block indices derive from the cells
    * themselves, so absent (all-zero) blocks cost nothing.
    */
  def multiplyBlocked(spark: SparkSession, a: DataFrame, b: DataFrame,
                      n: Long, blockSize: Int = 64): DataFrame = {
    val bs = blockSize
    // densify: sparse (pos, v) cells → row-major bs×bs dense block
    val densify = udf { cells: Seq[org.apache.spark.sql.Row] =>
      val block = new Array[Double](bs * bs)
      cells.foreach(r => block(r.getInt(0)) += r.getDouble(1))
      block
    }
    def toBlocks(df: DataFrame) = df.select(
        expr(s"i div $bs").as("bi"),
        expr(s"j div $bs").as("bj"),
        ((col("i") % bs) * bs + (col("j") % bs)).cast("int").as("pos"),
        col("v"))
      .groupBy("bi", "bj")
      .agg(collect_list(struct(col("pos"), col("v"))).as("cells"))
      .select(col("bi"), col("bj"), densify(col("cells")).as("block"))
    val ab = toBlocks(a).select(col("bi").as("ci"), col("bj").as("k"), col("block").as("ablk"))
      .join(toBlocks(b).select(col("bi").as("k"), col("bj").as("cj"), col("block").as("bblk")),
        "k")
      // block tables are tiny in BYTES, so AQE coalesces them to ~one
      // partition — which would serialize the O(n³) GEMM work onto one
      // core. Re-spread by output block; this hash clustering also
      // satisfies the (ci, cj, pos) grouping below, so the per-pair
      // GEMM, explode, and reduction all run in this one exchange.
      // range-partition + partition-local sort: every contraction pair
      // of an output block arrives contiguously, so the fused pass
      // below holds exactly ONE bs×bs accumulator at a time — per-task
      // memory is O(block), independent of how many output blocks land
      // in a partition (a hash-map of all local blocks would grow with
      // n²/numPartitions and OOM at the 100 TB target).
      .repartitionByRange(col("ci"), col("cj"))
      .sortWithinPartitions("ci", "cj")
    // Fused per-partition GEMM + cross-block accumulation: one
    // imperative pass (the genuine per-partition case from the build
    // ladder — this IS the reference's cache-tiled kernel,
    // `mm_opt.c:63-78`, with blocks for tiles) multiplies straight into
    // the current block's accumulator and emits its nonzero cells when
    // the (ci, cj) key changes. The declarative alternative (explode
    // partials + per-cell groupBy) puts n²·(n/BS) rows through a hash
    // aggregate — measured 2× slower at n=1024 — and a udaf block-sum
    // falls off the object-agg fast path entirely. Sums stay exact
    // (integral-valued derivations), so accumulation order is free.
    import spark.implicits._
    ab.select(col("ci"), col("cj"), col("ablk"), col("bblk"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions { it =>
        new Iterator[Iterator[(Long, Long, Double)]] {
          private val out = new Array[Double](bs * bs)
          private var cur: (Long, Long) = null

          private def gemmInto(x: Array[Double], y: Array[Double]): Unit = {
            var i = 0
            while (i < bs) {
              var k = 0
              while (k < bs) {
                val xv = x(i * bs + k)
                if (xv != 0.0) {
                  val rowOff = k * bs
                  val outOff = i * bs
                  var j = 0
                  while (j < bs) {
                    out(outOff + j) += xv * y(rowOff + j)
                    j += 1
                  }
                }
                k += 1
              }
              i += 1
            }
          }

          private def flush(): Iterator[(Long, Long, Double)] = {
            val (ci, cj) = cur
            val snapshot = out.clone()
            java.util.Arrays.fill(out, 0.0)
            Iterator.range(0, bs * bs).filter(snapshot(_) != 0.0).map { pos =>
              (ci * bs + pos / bs, cj * bs + pos % bs, snapshot(pos))
            }
          }

          def hasNext: Boolean = it.hasNext || cur != null

          def next(): Iterator[(Long, Long, Double)] = {
            while (it.hasNext) {
              val (ci, cj, x, y) = it.next()
              val key = (ci, cj)
              if (cur == null) { cur = key; gemmInto(x, y) }
              else if (cur == key) gemmInto(x, y)
              else {
                val emitted = flush()
                cur = key
                gemmInto(x, y)
                return emitted
              }
            }
            val emitted = flush()
            cur = null
            emitted
          }
        }.flatten
      }
      .toDF("i", "j", "v")
  }
}
