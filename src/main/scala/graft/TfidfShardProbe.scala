package graft

// Measurement tooling (dev/judge, not a driver surface): calibrates the
// tf·idf build-shard dial (r8 ask #5 / r9 ask #4). Records, at sfDir:
//   - the measured dot-relation candidate mass (Σ postings², the joined
//     rows the candidate self-join emits — TextOps.tfidfCandidateMass)
//   - min-of-2 timings of tfidf_cosine at buildShards ∈ {1, 2, 4, 8}
//     under the single-aggregation union (every pair lands in exactly
//     one shard, so shard branches union BEFORE the dot aggregation)
//   - the dial rule the engine ships: shards = max(ceil(docs /
//     maxBroadcastDocs), ceil(mass / maxPairsPerShard))
// One JSON line → TFIDF_SHARD_r{N}.json.
import org.apache.spark.sql.SparkSession
import graft.operators.TextOps

object TfidfShardProbe {
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
    docs.count() // scan warm-up

    val nDocs = docs.count()
    val mass = TextOps.tfidfCandidateMass(docs, k = 10)
    println(f"[tfidfshard] docs=$nDocs mass=$mass")

    def timed(shards: Int): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        TextOps.tfidfCosinePairs(docs, k = 10, thresholdHundredths = 60,
          buildShards = shards).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // per-shape codegen warm-up, untimed
      math.min(once(), once())
    }
    val rows = Seq(1, 2, 4, 8).map { s =>
      val t = timed(s)
      println(f"[tfidfshard] shards=$s $t%.2fs")
      Console.flush()
      f""""s$s":$t%.3f"""
    }
    println(s"""{"metric":"tfidf_shard","sf":"$sfDir","docs":$nDocs,""" +
      s""""cand_mass":$mass,""" +
      s""""rule":"shards = max(ceil(docs/maxBroadcastDocs=1e7), """ +
      s"""ceil(mass/maxPairsPerShard=2e9)) — single post-union dot agg",""" +
      s""""sec":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
