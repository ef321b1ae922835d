package graft

// Measurement tooling (dev/judge, not a driver surface): decomposes the
// minhash-LSH family's cost — the r6 verdict's only weak items (the
// bag-quotient wrap DOUBLED both queries' sf0.1 cost without a
// decomposition) — into, per tier (word / shingle):
//   1. classes — the quotient's class-count pass (also the price of
//      the short-circuit CHECK on a dup-free corpus)
//   2. raw     — signatures + banding on the raw corpus (the path the
//      short-circuit selects when classCount == docCount)
//   3. quotient— the engaged quotient path, forced (class collapse +
//      rep banding + member-wise expand)
//   4. auto    — the shipped entry point (counts memoized, so its
//      steady-state cost is the selected path alone)
// On the dup-free sf0.1 corpus, (3) − (2) is the overhead the r6 bench
// paid per run; (4) ≈ (2) is what the short-circuit recovers.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.MinhashProbe <sfDir>")
    val sfDir = args(0)
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

    def timed(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[minhash] $name%-18s ${secs}%7.2fs rows=$n%d")
      Console.flush()
      (name, secs, n)
    }

    // codegen warm-up on both paths of both tiers
    Dedup.minhashLshPairsRaw(docs).count()
    Dedup.minhashLshPairsForceQuotient(docs).count()
    Dedup.minhashShinglePairsRaw(docs).count()
    Dedup.minhashShinglePairsForceQuotient(docs).count()

    val stages = Seq(
      timed("word_classes") {
        docs.select(md5(concat_ws(" ",
          sort_array(array_distinct(split(col("text"), " ")))))
          .as("class_fp")).distinct().count()
      },
      timed("word_raw") { Dedup.minhashLshPairsRaw(docs).count() },
      timed("word_quotient") { Dedup.minhashLshPairsForceQuotient(docs).count() },
      timed("word_auto") { Dedup.minhashLshPairs(docs).count() },
      // the auto-rule's decision signal: estimated bucket-join pair
      // mass on the raw corpus (calibrates QuotientGainPerDoc)
      timed("word_candmass") {
        Dedup.wordCandMassRelation(docs).first().getLong(0)
      },
      timed("shingle_classes") {
        docs.select(md5(col("text").cast("binary")).as("class_fp"))
          .distinct().count()
      },
      timed("shingle_raw") { Dedup.minhashShinglePairsRaw(docs).count() },
      timed("shingle_quotient") { Dedup.minhashShinglePairsForceQuotient(docs).count() },
      timed("shingle_auto") { Dedup.minhashShingleLshPairs(docs).count() },
      timed("shingle_candmass") {
        Dedup.shingleCandMassRelation(docs).first().getLong(0)
      })

    def fmt(v: Double) = f"$v%.3f"
    val js = stages.map { case (n, s, r) =>
      s""""$n":{"sec":${fmt(s)},"rows":$r}""" }.mkString(",")
    println(s"""{"metric":"minhash_probe","sf":"$sfDir",$js}""")
    spark.stop()
  }
}
