package graft

// Measurement tooling (dev/judge, not a driver surface): the round-5
// question "can simhash band blocking prefilter pair generation for
// jaccardComponents?" — answered NO; reproduces the numbers cited in
// [[graft.operators.Dedup.jaccardComponents]]'s scaladoc (k=4 misses
// 85% of true J>=0.9 pairs; the first full-recall width k=20 emits
// 2300x the true pair count in candidates). Kept so the conclusion
// stays reproducible against future corpora.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object HybridProbe {
  def main(args: Array[String]): Unit = {
    // no default: a baked-in absolute path defeats the tool's purpose
    // (reproducing the conclusion against arbitrary future corpora)
    require(args.nonEmpty, "usage: graft.HybridProbe <sfDir>")
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

    // the relation jaccardComponents actually generates pairs on:
    // bag-class representatives
    val bagFp = md5(concat_ws("\u0000", col("lang"),
      concat_ws(" ", sort_array(array_distinct(split(col("text"), " "))))))
    val reps = docs.select(col("doc_id"), bagFp.as("bag_fp"))
      .groupBy("bag_fp").agg(min("doc_id").as("doc_id"))
      .join(docs, "doc_id")
      .localCheckpoint()
    println(s"[probe] reps = ${reps.count()} of ${docs.count()} docs")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val exact = Dedup.jaccardPairs(reps, 9)
      .select("d1", "d2").localCheckpoint()
    val nExact = exact.count()
    // warm
    exact.count()
    time("exact prefix-filter pairs")(
      Dedup.jaccardPairs(reps, 9).select("d1", "d2").count())

    for (k <- Seq(4, 8, 12, 16, 20)) {
      val cand = Dedup.simhashCandidates(reps, k)
        .select("d1", "d2").localCheckpoint()
      val nCand = cand.count()
      val missed = exact.join(cand, Seq("d1", "d2"), "left_anti").count()
      val t = time(s"band k=$k candidates")(
        Dedup.simhashCandidates(reps, k).select("d1", "d2").count())
      println(s"[probe] k=$k candidates=$nCand exactPairs=$nExact missed=$missed")
      val _ = t
    }
    spark.stop()
  }
}
