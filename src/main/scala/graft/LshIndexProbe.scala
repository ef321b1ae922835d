package graft

// Measurement tooling (dev/judge, not a driver surface): lifecycle
// probe for the persisted LSH band index (Dedup.saveLshBandIndex
// family), the text-tier sibling of PQINDEX_PROBE. Legs:
//   build — index the id-lower corpus half (signatures + band fps +
//           partitioned write);
//   bulk  — serve the full id-upper batch (the declared query's
//           regime; prefix pruning degrades gracefully to a full
//           signature-width scan);
//   point — serve ONE arriving doc (the ingest point-probe regime the
//           prefix layout exists for), with the partitions-read
//           fraction (batch prefixes / populated partitions) reported
//           as the scale-transferable access-path fact.
// Walls are min-of-2 on this host's ambient band; the volume facts
// (rows, prefixes, partitions) transfer. → LSHINDEX_PROBE_r{N}.json
// (append-only per the probe pinning rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object LshIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val half = docs.agg(max("doc_id")).first().getLong(0) / 2
    val corpus = docs.filter(col("doc_id") <= half)
    val batch = docs.filter(col("doc_id") > half)
    val corpusRows = corpus.count()
    val batchRows = batch.count()
    val path = java.nio.file.Files
      .createTempDirectory("graft_lsh_probe_").toString

    def minOf2(f: => Unit): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val tb0 = System.nanoTime()
    Dedup.saveLshBandIndex(corpus, path)
    val buildS = (System.nanoTime() - tb0) / 1e9
    val partitions = new java.io.File(s"$path/bands")
      .listFiles().count(_.getName.startsWith("fp_pfx="))

    val bulkS = minOf2(
      Dedup.dedupAgainstCorpusLshIndexed(spark, batch, path,
        minMatches = 24).count(): Unit)
    val one = batch.orderBy("doc_id").limit(1)
    val pointS = minOf2(
      Dedup.dedupAgainstCorpusLshIndexed(spark, one, path,
        minMatches = 24).count(): Unit)
    // the point probe's access path: its ≤bands distinct fp prefixes
    // vs the populated partition count
    val pointPfx = Dedup.lshBandFpRows(
        Dedup.minhashSignatures(one, 32), 32, 4)
      .select(substring(col("band_fp"), 1,
        Dedup.bandPfxWidthOf(spark, path))).distinct().count()

    println(f"[lshindexprobe] build=$buildS%.2fs bulk=$bulkS%.2fs " +
      f"point=$pointS%.2fs partitions=$partitions pointPfx=$pointPfx")
    println(s"""{"metric":"lsh_index_probe","sf":"$sfDir",""" +
      s""""corpus_rows":$corpusRows,"batch_rows":$batchRows,""" +
      f""""build_sec":$buildS%.3f,"bulk_serve_sec":$bulkS%.3f,""" +
      f""""point_serve_sec":$pointS%.3f,""" +
      s""""index_partitions":$partitions,""" +
      s""""point_prefixes_read":$pointPfx}""")
    spark.stop()
  }
}
