package graft

// Measurement tooling (dev/judge, not a driver surface): prices the
// stats-manifest serve against the plans it replaces, at a replica
// scale where files carry real row mass (the ZORDER_PROBE_r15 lesson:
// sf0.1's 64 files are footer-dominated).
//
//   full   — plain filtered scan over all files (parquet row-group
//            stats still prune WITHIN opened files);
//   manifest — [[graft.operators.Layout.manifestPrunedRead]]: file set
//            decided from the manifest relation alone, then the exact
//            filter — no data-file footer opens outside the kept set.
//
// Both run over the SAME z-ordered layout, so the delta isolates the
// planning mechanism, not the clustering. files_kept comes from the
// manifest (no data reads); wall is min-of-2 of the filtered count.
// The transferable 100 TB fact: the manifest answers "which files" in
// O(|files|) metadata rows; the full scan answers it by opening every
// footer — per-footer latency × file count is the real-lake cost this
// harness (local fs, warm page cache) underprices, stated honestly in
// the artifact note. → MANIFEST_PROBE_r{N}.json
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Layout

// r16 composition leg (r15 verdict #5): `layout` (arg 3) picks the
// lake's file clustering — `zorder` (default; the production shape:
// manifest OVER a z-ordered lake, rectangles in (user_id, value)
// space so few files intersect a box) vs `arrival` (round-robin
// scatter; every file spans the whole key space, so min/max stats
// keep almost everything). Same manifest machinery over both layouts
// at the same file count isolates how the planning win STACKS with
// clustering: the manifest decides which files, the z-order decides
// how few files there are to keep.
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val factor = args.lift(2).map(_.toInt).getOrElse(100)
    val layout = args.lift(3).getOrElse("zorder")
    require(layout == "zorder" || layout == "arrival",
      s"layout must be zorder|arrival, got $layout")
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
      .createTempDirectory("graft_manifest_probe_").toString
    if (layout == "zorder")
      Layout.zorderWrite(ev, col("user_id").cast("long"),
        floor(col("value")).cast("long"), s"$base/data", numFiles = files)
    else
      ev.repartition(files).write.mode("overwrite").parquet(s"$base/data")
    Layout.writeStatsManifest(spark, s"$base/data", s"$base/manifest",
      Seq("user_id", "value"))

    def minOf2(f: => Unit): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val ranges = Seq(("user_id", 300.0, 449.0), ("value", 100.0, 160.0))
    val all = spark.read.parquet(s"$base/data")
    val pred = col("user_id").between(300, 449) &&
      col("value").between(100.0, 160.0)
    val sel = all.where(pred).count()
    val kept = Layout.manifestFilesKept(spark, s"$base/manifest", ranges)
    val wFull = minOf2(all.where(pred).count(): Unit)
    val wMan = minOf2(Layout.manifestPrunedRead(spark, s"$base/data",
      s"$base/manifest", ranges).count(): Unit)
    println(f"[manifestprobe] rows=$rows sel=$sel files_kept=$kept/$files " +
      f"wall full=$wFull%.3f manifest=$wMan%.3f")
    Console.flush()
    println(s"""{"metric":"manifest_probe","sf":"$sfDir","rows":$rows,""" +
      s""""files":$files,"factor":$factor,"layout":"$layout",""" +
      s""""matching_rows":$sel,""" +
      s""""files_kept":$kept,""" +
      f""""wall_full_sec":$wFull%.3f,"wall_manifest_sec":$wMan%.3f,""" +
      s""""note":"local fs + warm page cache underprice per-footer """ +
      s"""latency; on a real lake the files_kept/files ratio times """ +
      s"""per-footer cost is the planning win"}""")
    spark.stop()
  }
}
