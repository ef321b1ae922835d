package graft

// Measurement tooling (dev/judge, not a driver surface): prices
// manifest-lake COMPACTION (r17, the r16 verdict #3 — the retire/
// compact leg appendWithManifest was missing). Builds the lake the
// way the stream twin does — B idempotent tagged appends, one part
// file + one manifest row each — then compacts to `files` range-sorted
// files and measures what the debt cost and what the rewrite buys:
//
//   before — B-file lake: pruned-serve wall, files kept, manifest rows;
//   after  — compacted lake: same measurements + the zero-loss check
//            (served rows identical across the compaction).
//
// The transferable 100 TB facts: (a) manifest rows and file count drop
// from O(batches) to O(target files) — the metadata a planner holds
// per query; (b) the RANGE-SORTED rewrite tightens per-file min/max,
// so the same box keeps FEWER files than it did before the rewrite
// (a bin-packing coalesce would instead widen every range and destroy
// pruning — the reason compactManifestLake sorts). → MANIFEST_COMPACT_
// PROBE_r{N}.json
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Layout

object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = args.lift(1).map(_.toInt).getOrElse(64)
    val factor = args.lift(2).map(_.toInt).getOrElse(20)
    val files = args.lift(3).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev1 = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val stride = ev1.agg(max("event_id")).first().getLong(0) + 1
    val ev =
      if (factor == 1) ev1
      else (0 until factor).map(f =>
        ev1.withColumn("event_id", col("event_id") + lit(f * stride)))
        .reduce(_.unionByName(_))
    val rows = ev.count()
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_probe_").toString
    // the stream-twin ingest shape: B tagged appends on user_id slices
    // (each batch covers the full user range — the arrival-order worst
    // case for stats, exactly the lake that needs the sorted rewrite)
    (0 until batches).foreach { b =>
      Layout.appendWithManifestIdempotent(spark,
        ev.where(col("event_id") % batches === b).coalesce(1),
        s"$base/data", s"$base/manifest", Seq("user_id", "value"),
        tag = b.toLong)
    }
    def dataFiles = new java.io.File(s"$base/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    def manifestRows = spark.read.parquet(s"$base/manifest").count()
    val ranges = Seq(("user_id", 300.0, 449.0))
    def servedIds() = Layout.manifestPrunedRead(spark, s"$base/data",
      s"$base/manifest", ranges).agg(count(lit(1)), sum("event_id"))
      .first()
    def minOf2(f: => Unit): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val (f0, m0) = (dataFiles, manifestRows)
    val kept0 = Layout.manifestFilesKept(spark, s"$base/manifest", ranges)
    val before = servedIds()
    val w0 = minOf2(servedIds(): Unit)
    val t0 = System.nanoTime()
    Layout.compactManifestLake(spark, s"$base/data", s"$base/manifest",
      Seq("user_id", "value"), numFiles = files, sortCol = "user_id")
    val wCompact = (System.nanoTime() - t0) / 1e9
    val (f1, m1) = (dataFiles, manifestRows)
    val kept1 = Layout.manifestFilesKept(spark, s"$base/manifest", ranges)
    val after = servedIds()
    val w1 = minOf2(servedIds(): Unit)
    require(before == after,
      s"zero-loss violated: served $before before vs $after after")
    println(f"[compactprobe] rows=$rows files $f0->$f1 manifest " +
      f"$m0->$m1 kept $kept0->$kept1 wall $w0%.3f->$w1%.3f " +
      f"(compact $wCompact%.3f)")
    Console.flush()
    println(s"""{"metric":"manifest_compact_probe","sf":"$sfDir",""" +
      s""""rows":$rows,"batches":$batches,"factor":$factor,""" +
      s""""target_files":$files,""" +
      s""""files_before":$f0,"files_after":$f1,""" +
      s""""manifest_rows_before":$m0,"manifest_rows_after":$m1,""" +
      s""""files_kept_before":$kept0,"files_kept_after":$kept1,""" +
      f""""wall_serve_before_sec":$w0%.3f,"wall_serve_after_sec":$w1%.3f,""" +
      f""""wall_compact_sec":$wCompact%.3f,""" +
      s""""served_equal":true,""" +
      s""""note":"arrival-order batches span the full key range, so """ +
      s"""stats keep ~all files before; the range-sorted rewrite both """ +
      s"""shrinks the file count and restores pruning"}""")
    spark.stop()
  }
}
