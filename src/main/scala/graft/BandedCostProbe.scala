package graft

// Measurement tooling (dev/judge, not a driver surface): names the
// paying stage inside the banded incremental fold (r17 — the quotient
// lever was measured NOT moving the cost, so the mass hypothesis is
// wrong; this probe decomposes the banded leg the MINHASH_SCALE way:
// cumulative prefixes, each forced by its own action).
//
//   idx_scan   — read + count the persisted 256-partition band index
//                (metadata: 256 dirs of footers at local scale);
//   cand       — + the banded equi-join and distinct pair set;
//   verify     — + token arrays and the exact sorted-intersect filter;
//   fold       — + the contracted connected-components fixpoint
//                (= the full jaccardComponentsIncrementalBanded).
//
// → appended to INCCOMP_PROBE_r{N}.json context.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object BandedCostProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hotband")) { hotband(args.drop(1)); return }
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
    val batch = docs.filter(col("doc_id") > cut)
      .withColumn("doc_id", col("doc_id") + lit(stride))
      .withColumn("text", concat_ws(" ", col("text"), lit("inccopy")))
      .localCheckpoint()
    val corpus = docs.localCheckpoint()
    val assign = Dedup.jaccardComponents(corpus, 9).localCheckpoint()
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_bandedcost_").toString
    Dedup.saveLshBandIndex(Dedup.bagClassReps(corpus), idxPath,
      numHashes = 32, bands = 8)

    def minOf2(f: => Long): (Double, Long) = {
      f
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (a, n) = once(); val (b, _) = once()
      (math.min(a, b), n)
    }
    val (tIdx, nIdx) = minOf2(
      spark.read.parquet(s"$idxPath/bands").count())
    val (tCand, nCand) = minOf2 {
      val qb = Dedup.lshBandFpRows(
          Dedup.minhashSignatures(batch, 32), 32, 8)
        .select(col("band_fp"), col("doc_id").as("d1"))
      val idx = spark.read.parquet(s"$idxPath/bands")
        .select(col("band_fp"), col("doc_id").as("d2"))
      qb.join(idx, "band_fp").select("d1", "d2").distinct().count()
    }
    val (tVerify, nVerify) = minOf2(
      Dedup.jaccardPairsAgainstCorpusBanded(spark, batch, corpus,
        idxPath, 9).count())
    val (tFold, nFold) = minOf2(
      Dedup.jaccardComponentsIncrementalBanded(spark, assign, corpus,
        batch, idxPath, 9).count())
    println(f"[bandedcost] idx_scan=$tIdx%.2fs ($nIdx rows) " +
      f"cand=$tCand%.2fs ($nCand pairs) verify=$tVerify%.2fs " +
      f"($nVerify pairs) fold=$tFold%.2fs ($nFold rows)")
    Console.flush()
    println(f"""{"metric":"banded_cost_probe","sf":"$sfDir",""" +
      f""""batch_pct":$batchPct,""" +
      f""""idx_scan_sec":$tIdx%.3f,"idx_rows":$nIdx,""" +
      f""""cand_sec":$tCand%.3f,"cand_pairs":$nCand,""" +
      f""""verify_sec":$tVerify%.3f,"verified_pairs":$nVerify,""" +
      f""""fold_sec":$tFold%.3f,"fold_rows":$nFold}""")
    spark.stop()
  }

  /** `hotband <nCorpus> <nBatch> <cap>` — the r17 verdict #1
    * adversarial fixture at probe scale: every doc shares a 36-token
    * core (one band fingerprint per band covers nearly the whole
    * corpus), so uncapped banded candidate mass approaches
    * |batch|·|corpus| and the cap's bound (|batch band rows| × cap)
    * is the number under test. → HOTBAND_PROBE_r{N}.json. */
  private def hotband(args: Array[String]): Unit = {
    val nCorpus = args.lift(0).map(_.toInt).getOrElse(20000)
    val nBatch = args.lift(1).map(_.toInt).getOrElse(500)
    val cap = args.lift(2).map(_.toLong).getOrElse(1000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val core = (1 to 36).map(i => s"c$i").mkString(" ")
    def mk(n: Int, idBase: Long, tag: String) =
      spark.range(0, n, 1, 32)
        .selectExpr(s"id + $idBase AS doc_id",
          s"concat('$core ${tag}', id, 'a ${tag}', id, 'b') AS text",
          "'en' AS lang", "'s' AS source", "40L AS n_chars")
    val corpus = mk(nCorpus, 1000000L, "x").localCheckpoint()
    val batch = mk(nBatch, 9000000L, "y").localCheckpoint()
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_hotband_probe_").toString
    Dedup.saveLshBandIndex(corpus, idxPath, numHashes = 32, bands = 8)
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // candidate mass per regime — count BEFORE distinct (the join's
    // raw output is what explodes; distinct is damage already done)
    def candMass(capV: Long): Long = {
      val qb = Dedup.lshBandFpRows(
          Dedup.minhashSignatures(batch, 32), 32, 8)
        .withColumn("fp_pfx", substring(col("band_fp"), 1,
          Dedup.bandPfxWidthOf(spark, idxPath)))
        .select(col("fp_pfx"), col("band_fp"), col("doc_id").as("d1"))
      val idx = spark.read.parquet(s"$idxPath/bands")
        .select(col("fp_pfx").cast("string").as("fp_pfx"),
          col("band_fp"), col("doc_id").as("d2"))
      val hot = idx.join(qb.select("fp_pfx", "band_fp").distinct(),
          Seq("fp_pfx", "band_fp"), "left_semi")
        .groupBy("fp_pfx", "band_fp").agg(count(lit(1)).as("plen"))
        .filter(col("plen") > capV).select("fp_pfx", "band_fp")
      qb.join(idx.join(hot, Seq("fp_pfx", "band_fp"), "left_anti"),
        Seq("fp_pfx", "band_fp")).count()
    }
    val (tUn, mUn) = timed(candMass(Long.MaxValue))
    val (tCap, mCap) = timed(candMass(cap))
    val audit = Dedup.bandedHotBands(spark, batch, idxPath, cap)
      .agg(count(lit(1)), coalesce(max("plen"), lit(0L)),
        coalesce(sum("skipped_candidates"), lit(0L))).first()
    val qbRows = Dedup.lshBandFpRows(
      Dedup.minhashSignatures(batch, 32), 32, 8).count()
    val bound = qbRows * cap
    println(f"[hotband] corpus=$nCorpus batch=$nBatch cap=$cap " +
      f"uncapped=$mUn (${tUn}%.2fs) capped=$mCap (${tCap}%.2fs) " +
      f"bound=$bound hot_bands=${audit.getLong(0)} " +
      f"max_plen=${audit.getLong(1)} skipped=${audit.getLong(2)}")
    Console.flush()
    println(f"""{"metric":"hotband_probe","n_corpus":$nCorpus,""" +
      f""""n_batch":$nBatch,"cap":$cap,""" +
      f""""uncapped_cand":$mUn,"uncapped_sec":$tUn%.3f,""" +
      f""""capped_cand":$mCap,"capped_sec":$tCap%.3f,""" +
      f""""cand_bound":$bound,"hot_bands":${audit.getLong(0)},""" +
      f""""max_plen":${audit.getLong(1)},""" +
      f""""skipped_candidates":${audit.getLong(2)}}""")
    spark.stop()
  }
}
