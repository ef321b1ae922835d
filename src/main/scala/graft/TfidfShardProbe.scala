package graft

// Measurement tooling (dev/judge, not a driver surface): calibrates the
// tf·idf build-shard dial (r8 ask #5 / r9 ask #4) and — r13 — the
// salient-postings CEILING (the r11/r12 carried ask: cap candidate
// mass algebraically, with the loss measured, not argued). Legs:
//   - shard: measured dot-relation candidate mass (Σ postings²) and
//     min-of-2 timings of tfidf_cosine at buildShards ∈ {1, 2, 4, 8}
//     at sfDir; the dial rule: shards = max(ceil(docs /
//     maxBroadcastDocs), ceil(mass / maxPairsPerShard))
//   - cap_audit (capDir, the verify SF): for each ceiling D, capped
//     mass, capped pair count, and MISSED pairs vs the uncapped truth
//     — the declared TfidfDfCeiling is chosen from this table
//   - growth (sfDir ×1/×2/×4 perturbed replicas — every replica gets
//     a doc-unique token so texts differ): uncapped mass grows
//     QUADRATICALLY with the replication factor (postings double →
//     postings² quadruple; no shard count absorbs that), capped mass
//     stays under the D·k·N LINE — the bounded-by-construction claim
//     as two measured curves, plus capped-vs-uncapped timings.
// One JSON line → TFIDF_SHARD_r{N}.json.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    val rows = Seq(0, 1, 2, 4, 8).map { s =>
      // s = 0 is the AUTO rule (r19 — the declared tfidf_cosine_sharded
      // configuration): stats memoized per session, 1 shard at this SF
      val t = timed(s)
      println(f"[tfidfshard] shards=$s $t%.2fs")
      Console.flush()
      f""""s$s":$t%.3f"""
    }

    // ---- leg 2: ceiling loss audit at the verify SF ----
    val capDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val capDocs = Tables.documents(spark, capDir)
    def pairKeys(df: DataFrame): DataFrame = df.select("d1", "d2")
    val truth = pairKeys(TextOps.tfidfCosinePairs(capDocs, k = 10,
      thresholdHundredths = 60)).localCheckpoint()
    val nTruth = truth.count()
    def cappedMass(docs: DataFrame, d: Long): Long =
      TextOps.salientVectors(docs, 10).groupBy("token")
        .agg(count(lit(1)).as("pc")).filter(col("pc") <= d)
        .agg(coalesce(sum(col("pc") * col("pc")), lit(0L)).as("m"))
        .first().getLong(0)
    val capAudit = Seq(150L, 180L, 200L).map { d =>
      val capped = pairKeys(TextOps.tfidfCosinePairsCapped(capDocs, k = 10,
        thresholdHundredths = 60, maxPostings = d)).localCheckpoint()
      val nCap = capped.count()
      val missed = truth.except(capped).count()
      val m = cappedMass(capDocs, d)
      println(s"[tfidfshard] cap D=$d pairs=$nCap/$nTruth missed=$missed " +
        s"mass=$m")
      Console.flush()
      s""""d$d":{"pairs":$nCap,"missed":$missed,"capped_mass":$m}"""
    }

    // ---- leg 3: perturbed heavy-tail growth at sfDir ----
    // ×f replicas under disjoint doc_ids, each with a doc-unique tail
    // token (df = 1 → salient but postings = 1: perturbs content, adds
    // ZERO candidate mass itself). Postings of every real token scale
    // ×f, so uncapped mass grows ×f² while the ceiling keeps capped
    // mass ≤ D·k·N — linear. D is scaled to the corpus the same way
    // the declared knob sits in sf0.01's postings spectrum (between
    // p50 and p90): here p50(sf0.1) ≈ 1601, so D = 1600.
    val growD = 1600L
    val maxId = docs.agg(max("doc_id")).first().getLong(0) + 1L
    def replicated(f: Int): DataFrame =
      (0 until f).map { r =>
        docs.select((col("doc_id") + lit(r * maxId)).as("doc_id"),
          col("lang"),
          concat(col("text"), lit(" uniqtok"),
            (col("doc_id") + lit(r * maxId)).cast("string")).as("text"))
      }.reduce(_ unionByName _)
    val growth = Seq(1, 2, 4).map { f =>
      val d = replicated(f).localCheckpoint()
      val n = d.count()
      val mU = TextOps.tfidfCandidateMass(d, 10)
      val mC = cappedMass(d, growD)
      def onceCap(): Double = {
        val t0 = System.nanoTime()
        TextOps.tfidfCosinePairsCapped(d, k = 10, thresholdHundredths = 60,
          maxPostings = growD).count()
        (System.nanoTime() - t0) / 1e9
      }
      val tCap = { onceCap(); math.min(onceCap(), onceCap()) }
      // uncapped timing only to ×2: the ×4 mass (~16× sf0.1's 86M) is
      // exactly the blowup the cap exists to avoid paying
      val tUncap = if (f <= 2) {
        def once(): Double = {
          val t0 = System.nanoTime()
          TextOps.tfidfCosinePairs(d, k = 10, thresholdHundredths = 60)
            .count()
          (System.nanoTime() - t0) / 1e9
        }
        once(); math.min(once(), once())
      } else -1.0
      println(f"[tfidfshard] growth x$f docs=$n uncapped_mass=$mU " +
        f"capped_mass=$mC cap_sec=$tCap%.2f uncap_sec=$tUncap%.2f")
      Console.flush()
      f""""x$f":{"docs":$n,"uncapped_mass":$mU,"capped_mass":$mC,""" +
        f""""cap_sec":$tCap%.3f,"uncap_sec":$tUncap%.3f}"""
    }

    println(s"""{"metric":"tfidf_shard","sf":"$sfDir","docs":$nDocs,""" +
      s""""cand_mass":$mass,""" +
      s""""rule":"shards = max(ceil(docs/maxBroadcastDocs=1e7), """ +
      s"""ceil(mass/maxPairsPerShard=2e9)) — single post-union dot agg",""" +
      s""""sec":{${rows.mkString(",")}},""" +
      s""""cap_sf":"$capDir","cap_truth_pairs":$nTruth,""" +
      s""""cap_audit":{${capAudit.mkString(",")}},""" +
      s""""growth_ceiling":$growD,""" +
      s""""growth":{${growth.mkString(",")}}}""")
    spark.stop()
  }
}
