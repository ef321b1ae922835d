package graft

// Measurement tooling (dev/judge, not a driver surface): layout probe
// for Layout.zorderWrite. Writes the sfDir events table twice — arrival
// order (event_id ranges, what an ingest sink produces) and z-ordered
// on (user_id, ⌊value⌋) — into the same file count, then measures two
// predicate shapes on both layouts:
//   box   — user_id range × value range (~10% × ~10%),
//   strip — value range alone (the dimension no single-column sort on
//           user_id would have served).
// files = files actually containing matching rows (the stats-prunable
// floor); wall = min-of-2 of the filtered count with pushdown active.
// The files ratio is the scale-transferable fact; at 100 TB it is the
// fraction of the lake a box scan reads. → ZORDER_PROBE_r{N}.json
// (append-only per the probe pinning rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Layout

object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.lift(1).map(_.toInt).getOrElse(64)
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

    // ×factor replica leg (r14 verdict #8): at sf0.1 the 64 files are
    // footer-dominated (~1.5k rows each) and the 16× file reduction
    // can't move wall time; replicas with disjoint event_ids (same
    // user_id/value distribution, so predicates keep their
    // selectivity) grow per-file row mass until the scan cost is real
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val ev1 = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value")
    val stride = ev1.agg(max("event_id")).first().getLong(0) + 1
    val ev =
      if (factor == 1) ev1
      else (0 until factor).map(f =>
        ev1.withColumn("event_id", col("event_id") + lit(f * stride)))
        .reduce(_.unionByName(_))
    val rows = ev.count()
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder_").toString
    ev.repartitionByRange(files, col("event_id"))
      .write.mode("overwrite").parquet(s"$base/natural")
    Layout.zorderWrite(ev, col("user_id"), floor(col("value")),
      s"$base/zorder", numFiles = files)
    val nat = spark.read.parquet(s"$base/natural")
    val zo = spark.read.parquet(s"$base/zorder")

    def minOf2(f: => Unit): Double = {
      f // codegen + footer warm-up
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val preds = Seq(
      "box" -> (col("user_id").between(300, 449) &&
        col("value").between(100.0, 160.0)),
      "strip" -> col("value").between(100.0, 160.0))
    val legs = preds.map { case (name, pred) =>
      val nf = Layout.filesTouched(nat, pred)
      val zf = Layout.filesTouched(zo, pred)
      val sel = nat.where(pred).count()
      val nw = minOf2(nat.where(pred).count(): Unit)
      val zw = minOf2(zo.where(pred).count(): Unit)
      println(f"[zorderprobe] $name sel=$sel files $nf->$zf " +
        f"wall $nw%.3f->$zw%.3f s")
      Console.flush()
      f""""$name":{"matching_rows":$sel,"files_natural":$nf,""" +
        f""""files_zorder":$zf,"wall_natural_sec":$nw%.3f,""" +
        f""""wall_zorder_sec":$zw%.3f}"""
    }
    println(s"""{"metric":"zorder_layout_probe","sf":"$sfDir",""" +
      s""""rows":$rows,"files":$files,"factor":$factor,""" +
      s""""legs":{${legs.mkString(",")}}}""")

    // r16 SCALED-vs-MASKED leg: z-order on the WIDE key pair
    // (event_id, user_id) — event_id exceeds 2^16 at sf0.1 ×factor,
    // so the plain masked zValue wraps (id % 65536) and an id-box
    // scatters across every z range; zorderWriteScaled min-max-buckets
    // first, keeping the box a contiguous z band. Same replica set,
    // same file count — the delta isolates the bucketing.
    Layout.zorderWrite(ev, col("event_id"), col("user_id"),
      s"$base/wide_masked", numFiles = files)
    Layout.zorderWriteScaled(ev, col("event_id"), col("user_id"),
      s"$base/wide_scaled", numFiles = files)
    val idLo = stride * factor / 3
    val idBox = col("event_id").between(idLo, idLo + stride * factor / 20)
    val wm = spark.read.parquet(s"$base/wide_masked")
    val ws = spark.read.parquet(s"$base/wide_scaled")
    val mf = Layout.filesTouched(wm, idBox)
    val sf2 = Layout.filesTouched(ws, idBox)
    println(f"[zorderprobe] scaled-vs-masked id-box files $mf -> $sf2")
    Console.flush()
    println(s"""{"metric":"zorder_scaled_probe","sf":"$sfDir",""" +
      s""""rows":$rows,"files":$files,"factor":$factor,""" +
      s""""id_box_files_masked":$mf,"id_box_files_scaled":$sf2}""")
    spark.stop()
  }
}
