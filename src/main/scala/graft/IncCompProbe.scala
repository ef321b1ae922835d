package graft

// Measurement tooling (dev/judge, not a driver surface): prices the
// r16 incremental-clustering fold against the full recompute it
// provably equals (the dedup_components_incremental oracle IS the
// full-recompute SQL — correctness is settled there; this probe
// answers only "what does the law BUY?").
//
//   recompute — jaccardComponents over corpus ∪ batch: corpus-wide
//     prefix-filtered pair generation + the bounded-round fixpoint,
//     the cost a nightly re-cluster pays.
//   incremental — jaccardComponentsIncremental(assign, corpus,
//     batch): delta-sized pair generation (batch-batch prefix tier +
//     broadcast-verify batch-corpus, corpus never shuffles) + the
//     CONTRACTED fixpoint (batch docs + touched labels). The existing
//     assignment builds off-clock — it is the standing lake artifact.
//
// Batch = a `batchPct`-sized fresh-id near-dup replica of the corpus
// tail (the smoke's copy-tag construction, so batch docs genuinely
// pair with corpus docs and the cross tier does real work).
// → INCCOMP_PROBE_r{N}.json (append-only probe pinning rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object IncCompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchPct = args.lift(1).map(_.toInt).getOrElse(10)
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
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val stride = maxId + 1
    val cut = maxId - maxId * batchPct / 100
    // batch: fresh ids, near-dup copies of the corpus tail (copy-tag
    // appended, the ScaleSmoke construction) — so batch-corpus pairs
    // genuinely fire
    val batch = docs.filter(col("doc_id") > cut)
      .withColumn("doc_id", col("doc_id") + lit(stride))
      .withColumn("text", concat_ws(" ", col("text"), lit("inccopy")))
      .localCheckpoint()
    val corpus = docs.localCheckpoint()
    val union = corpus.unionByName(batch).localCheckpoint()

    // the standing assignment is the lake artifact — built off-clock
    val assign = Dedup.jaccardComponents(corpus, 9)
      .localCheckpoint()

    def minOf2(f: => Long): (Double, Long) = {
      f // codegen warm-up
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (a, n) = once(); val (b, _) = once()
      (math.min(a, b), n)
    }
    val (tFull, nFull) = minOf2(
      Dedup.jaccardComponents(union, 9).count())
    val (tInc, nInc) = minOf2(
      Dedup.jaccardComponentsIncremental(assign, corpus, batch, 9)
        .count())
    require(nFull == nInc,
      s"law violated at probe scale: full=$nFull inc=$nInc")
    // r17 BANDED leg: the same fold with the batch-corpus tier served
    // from the persisted bands=8 index QUOTIENTED by bag class (the
    // past-the-broadcast-cap shape, the declared configuration) —
    // index build off-clock like the assignment; the require measures
    // banding recall on this corpus (deterministic md5-seeded family —
    // equality is a fixture fact the oracle also re-proves each round)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_inccomp_lsh_").toString
    Dedup.saveLshBandIndex(Dedup.bagClassReps(corpus), idxPath,
      numHashes = 32, bands = 8)
    val (tBand, nBand) = minOf2(
      Dedup.jaccardComponentsIncrementalBanded(spark, assign, corpus,
        batch, idxPath, 9).count())
    require(nFull == nBand,
      s"banded fold diverged at probe scale: full=$nFull banded=$nBand")
    println(f"[inccomp] batch=$batchPct%% recompute=$tFull%.2fs " +
      f"incremental=$tInc%.2fs banded=$tBand%.2fs " +
      f"speedup=${tFull / tInc}%.2fx/${tFull / tBand}%.2fx rows=$nFull")
    Console.flush()
    println(f"""{"metric":"inccomp_probe","sf":"$sfDir",""" +
      f""""batch_pct":$batchPct,"rows":$nFull,""" +
      f""""recompute_sec":$tFull%.3f,"incremental_sec":$tInc%.3f,""" +
      f""""banded_sec":$tBand%.3f,""" +
      f""""speedup":${tFull / tInc}%.2f,""" +
      f""""banded_speedup":${tFull / tBand}%.2f,""" +
      f""""banded_equal":true}""")
    spark.stop()
  }
}
