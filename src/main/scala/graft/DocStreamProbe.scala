package graft

// Measurement tooling (dev/judge, not a driver surface): throughput +
// quality legs for the two r14 stream twins that shipped
// equality-tested but unmeasured (r14 verdict #4) — the same standard
// as VecStreamProbe's `adc_serve` leg (STREAM_PROBE_r14.json):
//
//   lsh_ingest — [[graft.streaming.DocStream.lshIndexIngestStream]]
//     against a persisted [[graft.operators.Dedup.saveLshBandIndex]]
//     over the sf0.01 id-lower document half (the declared
//     `dedup_incremental_lsh_indexed` corpus shape): rows/s of the
//     stream-static band join + watermark-bounded twin aggregation at
//     ×1/×10 arriving volume (id-upper half replicated under fresh
//     ids, so every replica probes the same corpus candidates — the
//     join volume scales linearly with arrival rate, the regime the
//     number claims). The index persists off the clock (it is the
//     offline lake artifact); a warm-up micro-batch compiles the plan.
//   pii_scrub — [[graft.streaming.DocStream.piiScrubStream]] over the
//     PII-fixture corpus (regexes must actually match for the number
//     to be honest): rows/s of the stateless scan-speed scrub at
//     ×1/×10.
//   lsh_quality — the LSH twin's quarantine set at probe scale: the
//     streamed (doc_id → n_twins) map vs the batch
//     [[graft.operators.Dedup.dedupAgainstCorpusLshIndexed]] verdict
//     on the same arriving rows; `quarantine_match` is the fraction of
//     batch-quarantined docs the stream flags with the same twin count
//     (expected 1.0 — the stream IS the batch algebra under a
//     watermark).
//
// → STREAM_PROBE_r{N}.json `doc` legs (append-only probe pinning rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.streaming.DocStream

object DocStreamProbe {
  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
    val mid = docs.agg(max("doc_id")).first().getLong(0) / 2
    val corpus = docs.filter(col("doc_id") <= mid)
    val batchBase = docs.filter(col("doc_id") > mid)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val piiBase = TextOps.withPiiFixture(docs).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_docprobe_idx_").toString
    Dedup.saveLshBandIndex(corpus, idxPath) // offline artifact, off-clock

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def replicate(base: Array[(Long, String)], factor: Int): Seq[Doc] =
      (0 until factor).flatMap { f =>
        base.map { case (id, tx) => Doc(1000000L * (f + 1) + id, t0, tx) }
      }

    def throughput(tag: String, base: Array[(Long, String)],
                   mkQuery: (MemoryStream[Doc], String) =>
                     org.apache.spark.sql.streaming.StreamingQuery,
                   factors: Seq[Int]): String = {
      val cells = factors.map { factor =>
        val input = MemoryStream[Doc](spark)
        val q = mkQuery(input, s"${tag}_x$factor")
        try {
          input.addData(replicate(base, 1).take(10))
          q.processAllAvailable() // warm-up: plan + static side, off-clock
          val rows = replicate(base, factor)
          input.addData(rows)
          val start = System.nanoTime()
          q.processAllAvailable()
          val sec = (System.nanoTime() - start) / 1e9
          val rps = rows.size / sec
          println(f"[docstream] $tag x$factor rows=${rows.size} " +
            f"sec=$sec%.2f rows_per_sec=$rps%.0f")
          Console.flush()
          f""""x$factor":{"rows":${rows.size},"sec":$sec%.3f,"rows_per_sec":$rps%.0f}"""
        } finally q.stop()
      }
      s""""$tag":{${cells.mkString(",")}}"""
    }

    val lshIngest = throughput("lsh_ingest", batchBase, { (input, sink) =>
      DocStream.lshIndexIngestStream(spark, input.toDF(), idxPath,
          minMatches = 24)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
    }, Seq(1, 10))

    val piiScrub = throughput("pii_scrub", piiBase, { (input, sink) =>
      DocStream.piiScrubStream(input.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
    }, Seq(1, 10))

    // ---- quality leg: streamed quarantine set vs the batch verdict ----
    val qRows = replicate(batchBase, 1)
    val input = MemoryStream[Doc](spark)
    val q = DocStream.lshIndexIngestStream(spark, input.toDF(), idxPath,
        minMatches = 24)
      .writeStream.format("memory").queryName("lsh_quality")
      .outputMode("append").start()
    val streamed = try {
      input.addData(qRows)
      q.processAllAvailable()
      // close the watermark so pending finals emit (off the clock)
      input.addData(Doc(99999999L,
        java.sql.Timestamp.valueOf("2026-01-01 03:00:00"), "closer"))
      q.processAllAvailable()
      spark.table("lsh_quality").select("doc_id", "n_twins").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
        .removed(99999999L)
    } finally q.stop()
    val batch = Dedup.dedupAgainstCorpusLshIndexed(spark,
        qRows.toDF().select("doc_id", "text"), idxPath, minMatches = 24)
      .filter(col("keep") === 0)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_twins")).toMap
    val matched = batch.count { case (id, n) => streamed.get(id).contains(n) }
    val extra = streamed.keySet.diff(batch.keySet).size
    val qmatch = if (batch.isEmpty) 0.0 else matched.toDouble / batch.size
    println(f"[docstream] lsh_quality quarantined=${batch.size} " +
      f"matched=$matched extra=$extra match=$qmatch%.3f")
    Console.flush()
    val quality = f""""lsh_quality":{"quarantined":${batch.size},""" +
      f""""matched":$matched,"stream_extra":$extra,""" +
      f""""quarantine_match":$qmatch%.3f}"""

    println(s"""{"metric":"doc_stream_probe","sf":"$dir",""" +
      s"""$lshIngest,$piiScrub,$quality}""")
    spark.stop()
  }
}
