package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MatrixOps

/** The reference's CLI bench grammar (SURVEY.md §2.4) as a config:
  * Stage 1 `<sizes...> -r R`, Stage 2 `<algo> <sizes...> -r R --block BS
  * --density D`, Stage 3 `<sizes...> -p P -r R`. `threads` is recorded in
  * the results (the platform owns parallelism — partition count / master
  * cores — the way OpenMP/`local[p]` owned it in the reference).
  */
final case class BenchConfig(
    sizes: Seq[Long] = Seq(64, 128, 256),
    algos: Seq[String] = Seq("basic"),
    repeats: Int = 3,
    blockSize: Int = 64,
    density: Double = 0.05,
    seed: Long = 403086L) // BASE_SEED everywhere in the reference (mm_baseline.py:11 etc.)

/** Bench-harness parity (SURVEY.md §2.3 A1-A6, M2 of the build plan):
  * run the matmul kernels over a sizes×algos×repeats grid, time the Spark
  * action only (Q4 — the timed region is declared, unlike the reference's
  * stage-dependent inclusion of generation), probe driver memory (A3),
  * emit ONE ROW PER REPEAT (Q5 — Stage 3's actual behavior) in the
  * reference's S2/S3-shaped schema, and sink to header CSV (A6).
  * Averaging is a downstream query (Analytics.avgTime), not baked in.
  */
object BenchHarness {

  /** S2/S3-union results schema plus executor-side metrics: the
    * reference probes process RSS/heap (A3); on Spark the numbers that
    * matter are per-job executor metrics — shuffle traffic, spill, peak
    * execution memory — collected from task metrics via a listener. */
  final case class ResultRow(
      lang: String, algo: String, size: Long, threads: Int, repeat_idx: Int,
      time_ms: Double, heap_now_mb: Double, heap_peak_mb: Double,
      allocated_mb: Double, shuffle_write_mb: Double, spill_mb: Double,
      peak_exec_mem_mb: Double, extra: String)

  /** Aggregates task metrics between `reset` and `snapshot` — the
    * engine-native replacement for the reference's RSS probes
    * (`mm_baseline.py:31-62`, `mm_opt_par.c:66-78`). */
  private final class TaskMetricsCollector extends org.apache.spark.scheduler.SparkListener {
    private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    private val spill = new java.util.concurrent.atomic.AtomicLong
    private val peakExec = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
      }
    }
    def reset(): Unit = { shuffleWrite.set(0); spill.set(0); peakExec.set(0) }
    def snapshot: (Double, Double, Double) =
      (shuffleWrite.get / 1048576.0, spill.get / 1048576.0, peakExec.get / 1048576.0)
  }

  /** Kernel dispatch — the reference's CLI algo string-compare chain
    * (`MMOpt.java:170-186`, `mm_opt.c:162-173`). */
  def kernel(spark: SparkSession, algo: String, n: Long,
             cfg: BenchConfig): DataFrame = {
    // Q2: Stages 1-2 use seed / seed+1 for A / B; "square" mirrors the
    // Stage-3 same-seed case.
    val a = MatrixOps.genDense(spark, n, cfg.seed)
    lazy val b = MatrixOps.genDense(spark, n, cfg.seed + 1)
    algo match {
      case "basic"      => MatrixOps.multiply(a, b)
      case "transposed" => MatrixOps.multiplyTransposed(a, MatrixOps.transpose(b))
      case "blocked"    => MatrixOps.multiplyBlocked(spark, a, b, n, cfg.blockSize)
      case "sparse"     => MatrixOps.multiply(
        MatrixOps.genSparse(spark, n, cfg.density, cfg.seed), b,
        broadcastRight = true)
      case "square"     => MatrixOps.multiply(a, a)
      case other        => throw new IllegalArgumentException(s"unknown algo: $other")
    }
  }

  private def heapNowMb: Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / 1048576.0
  }

  private def heapPeakMb: Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / 1048576.0
  }

  /** Run the grid; one timed action (count) per repeat, with executor
    * task metrics captured per run. */
  def run(spark: SparkSession, cfg: BenchConfig): DataFrame = {
    import spark.implicits._
    val threads = spark.sparkContext.defaultParallelism
    val collector = new TaskMetricsCollector
    spark.sparkContext.addSparkListener(collector)
    try {
      val rows = for {
        algo <- cfg.algos
        n <- cfg.sizes
        r <- 0 until cfg.repeats
      } yield {
        val df = kernel(spark, algo, n, cfg)
        collector.reset()
        val t0 = System.nanoTime()
        df.count()
        val ms = (System.nanoTime() - t0) / 1e6
        // listener events are async; drain before reading the counters
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(
          spark.sparkContext, 10000)
        val (shuffleMb, spillMb, peakMb) = collector.snapshot
        // A5 — the reference's allocated-bytes metric: 3·n²·8 bytes as MB.
        ResultRow("spark", algo, n, threads, r, ms, heapNowMb, heapPeakMb,
          3.0 * n * n * 8 / 1048576.0, shuffleMb, spillMb, peakMb,
          s"{block:${cfg.blockSize},density:${cfg.density}}")
      }
      rows.toDF()
    } finally spark.sparkContext.removeSparkListener(collector)
  }

  /** A6 — header CSV sink; single part like the reference's one file per
    * run (results stay tiny relative to the data they describe). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)

  /** Single NAMED results file, the reference's
    * `results_<lang>_<tag>.csv` convention (`mm_opt_par.c:95`,
    * `MMOptPar.java:70`): Spark's directory sink writes `part-*` names
    * the results-lake glob (`ResultsCsv.readResultsDir`,
    * `results_*.csv`) would skip, so the part file is renamed into
    * place driver-side — results are metadata-scale, one file per run
    * by construction. */
  def writeNamedCsv(df: DataFrame, dir: String, fileName: String): java.nio.file.Path = {
    val spark = df.sparkSession
    val tmp = s"$dir/.tmp_$fileName"
    writeCsv(df, tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.csv"))
    require(parts != null && parts.nonEmpty,
      s"no part-*.csv under $tmp — the CSV write aborted or a " +
        "non-default committer changed the part naming")
    val part = parts.head.getPath
    val dest = new org.apache.hadoop.fs.Path(s"$dir/$fileName")
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    java.nio.file.Paths.get(s"$dir/$fileName")
  }
}
