package graft

// Measurement tooling (dev/judge, not a driver surface): throughput +
// equality legs for the r16 manifest-lifecycle stream twin
// ([[graft.streaming.EventStream.manifestIngestStream]]), to the same
// standard as DocStreamProbe's lsh_ingest / lsh_quality legs
// (STREAM_PROBE_r15.json):
//
//   manifest_ingest — rows/s of the foreachBatch-driven
//     appendWithManifest lake ingest at ×1/×10 arriving volume (sf0.01
//     events replicated under shifted event_ids). Each micro-batch
//     pays one part-file write + one stat pass over ONLY its fresh
//     files; the number prices the whole twin, data write included
//     (unlike the pruned-serve rows, there is no off-clock artifact —
//     ingest IS the op).
//   manifest_match — the streamed manifest vs a from-scratch
//     writeStatsManifest rebuild over the same lake files: row-set
//     equality is the lifecycle-correctness fact (the delta-scale
//     appends accumulated to exactly the full-pass truth).
//
// → STREAM_PROBE_r{N}.json `event` legs (append-only probe pinning
// rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

object EventStreamProbe {
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double, props: String)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    import spark.implicits._

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val base = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
      .limit(20000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val stride = base.map(_._1).max + 1
    def replicate(factor: Int): Seq[Ev] =
      (0 until factor).flatMap { f =>
        base.map { case (id, u, et, v) =>
          Ev(f * stride + id, t0, u, et, v, "") }
      }

    def ingestLeg(factor: Int): (String, String) = {
      val lake = java.nio.file.Files
        .createTempDirectory(s"graft_evprobe_x${factor}_").toString
      val input = MemoryStream[Ev](spark)
      val q = EventStream.manifestIngestStream(input.toDF(),
        s"$lake/data", s"$lake/manifest", Seq("user_id", "value"),
        s"$lake/ckpt")
      try {
        // warm-up micro-batch: plan + codegen, off-clock (its files
        // stay in the lake; the equality leg rebuilds over ALL files
        // so warm-up rows don't skew it)
        input.addData(replicate(1).take(100))
        q.processAllAvailable()
        val rows = replicate(factor)
        val batches = 4
        val per = (rows.length + batches - 1) / batches
        val t = System.nanoTime()
        rows.grouped(per).foreach { g =>
          input.addData(g); q.processAllAvailable()
        }
        val sec = (System.nanoTime() - t) / 1e9
        val rps = (rows.length / sec).toLong
        (s""""x$factor":{"rows":${rows.length},"sec":${f"$sec%.3f"},""" +
          s""""rows_per_sec":$rps}""", lake)
      } finally q.stop()
    }

    val (cell1, lake1) = ingestLeg(1)
    val (cell10, _) = ingestLeg(10)

    // equality: streamed manifest (warm-up + 4 micro-batches of
    // delta-scale appends) vs one full-pass rebuild over lake1
    graft.operators.Layout.writeStatsManifest(spark, s"$lake1/data",
      s"$lake1/manifest_rebuilt", Seq("user_id", "value"))
    def rowSet(p: String) = spark.read.parquet(p)
      .collect().map(_.toSeq).toSet
    val streamed = rowSet(s"$lake1/manifest")
    val rebuilt = rowSet(s"$lake1/manifest_rebuilt")
    val matched = (streamed intersect rebuilt).size

    println(s"""{"metric":"event_stream_probe","sf":"$dir",""" +
      s""""manifest_ingest":{$cell1,$cell10},""" +
      s""""manifest_match":{"streamed_files":${streamed.size},""" +
      s""""rebuilt_files":${rebuilt.size},"matched":$matched,""" +
      s""""equal":${streamed == rebuilt}}}""")
    spark.stop()
  }
}
