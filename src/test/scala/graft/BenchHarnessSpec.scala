package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Bench-harness grid semantics (SURVEY.md A1-A6, Q4/Q5). */
class BenchHarnessSpec extends SparkSpec {

  test("grid emits one row per repeat (Q5) with the declared schema") {
    val cfg = BenchConfig(sizes = Seq(8, 16), algos = Seq("basic", "sparse"),
      repeats = 2)
    val out = BenchHarness.run(spark, cfg).cache()
    assert(out.count() === 8) // 2 algos × 2 sizes × 2 repeats
    assert(out.columns.toSeq === Seq("lang", "algo", "size", "threads",
      "repeat_idx", "time_ms", "heap_now_mb", "heap_peak_mb",
      "allocated_mb", "shuffle_write_mb", "spill_mb", "peak_exec_mem_mb",
      "extra"))
    // the join+agg kernels shuffle, so the metric must be live
    assert(out.filter(col("shuffle_write_mb") > 0).count() > 0)
    assert(out.filter(col("time_ms") <= 0).count() === 0)
    // A5: allocated = 3n²·8 bytes in MB
    val alloc = out.filter(col("size") === 16).select("allocated_mb")
      .collect().head.getDouble(0)
    assert(math.abs(alloc - 3.0 * 16 * 16 * 8 / 1048576.0) < 1e-12)
  }

  test("all five kernels run and downstream averaging works (A1)") {
    val cfg = BenchConfig(sizes = Seq(8),
      algos = Seq("basic", "transposed", "blocked", "sparse", "square"),
      repeats = 1)
    val out = BenchHarness.run(spark, cfg)
    val avg = Analytics.avgTime(out)
    assert(avg.count() === 5)
    assert(avg.filter(col("avg_time_ms").isNull).count() === 0)
  }

  test("csv sink round-trips through the results reader (A6)") {
    val dir = java.nio.file.Files.createTempDirectory("bench_csv").toString
    val out = BenchHarness.run(spark, BenchConfig(sizes = Seq(8), repeats = 1))
    BenchHarness.writeCsv(out, s"$dir/results_spark")
    val back = spark.read.option("header", "true").csv(s"$dir/results_spark")
    assert(back.count() === 1)
    assert(back.columns.contains("extra"))
  }
}
