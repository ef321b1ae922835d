package graft

// TEMPORARY r18-optimization decomposition probe (deleted before the
// round closes): prices the stages inside the incremental fold and the
// full clustering so the optimization targets the paying stage.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object TmpFoldProbe {
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
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val cut = maxId - maxId / 10
    val batch0 = docs.filter(col("doc_id") > cut)
    val corpus0 = docs.filter(col("doc_id") <= cut)
    val batch = batch0.localCheckpoint()
    val corpus = corpus0.localCheckpoint()
    val assign = Dedup.jaccardComponents(corpus, 9).localCheckpoint()

    def minOf2[T](f: => T): Double = {
      f
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // --- full clustering decomposition (dedup_components) ---
    val tPairs = minOf2(Dedup.jaccardPairs(docs, 9).count())
    val (comp, rounds) = Dedup.connectedComponentsWithRounds(
      Dedup.jaccardPairs(docs, 9))
    val tCcOnly = minOf2(Dedup.connectedComponents(
      Dedup.jaccardPairs(docs, 9).select("d1", "d2").localCheckpoint()).count())
    val tComp = minOf2(Dedup.jaccardComponents(docs, 9).count())
    println(f"[fold] full: pairs=$tPairs%.2f ccOnly(ckpt pairs)=$tCcOnly%.2f " +
      f"components=$tComp%.2f rounds=$rounds")

    // --- incremental fold decomposition ---
    val tBB = minOf2(Dedup.jaccardPairs(batch, 9).select("d1", "d2").count())
    val tBC = minOf2(Dedup.jaccardPairsAgainstCorpus(batch, corpus, 9)
      .select("d1", "d2").count())
    val tInc = minOf2(Dedup.jaccardComponentsIncremental(
      assign, corpus, batch, 9).count())
    // fold alone: pin the pair tiers, run foldComponents via the public
    // entry with pre-checkpointed pair inputs is private — approximate by
    // (tInc - tBB - tBC) and also measure CC on the delta edges directly
    val bb = Dedup.jaccardPairs(batch, 9).select("d1", "d2").localCheckpoint()
    val bc = Dedup.jaccardPairsAgainstCorpus(batch, corpus, 9)
      .select("d1", "d2").localCheckpoint()
    val a = assign.select(col("doc_id").as("cid"), col("component").as("ccomp"))
    val edges = bb.unionByName(
      bc.join(a, bc("d2") === a("cid"), "left")
        .select(col("d1"), coalesce(col("ccomp"), col("d2")).as("d2")))
      .localCheckpoint()
    val (_, dRounds) = Dedup.connectedComponentsWithRounds(edges)
    val tDeltaCC = minOf2(Dedup.connectedComponents(edges).count())
    println(f"[fold] inc: bb=$tBB%.2f bc=$tBC%.2f inc_total=$tInc%.2f " +
      f"deltaCC(ckpt edges)=$tDeltaCC%.2f deltaRounds=$dRounds")
    spark.stop()
  }
}
