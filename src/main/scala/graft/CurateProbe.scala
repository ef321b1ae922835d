package graft

// Measurement tooling (dev/judge, not a driver surface): the
// pipeline_curate_v2 stage-cost breakdown the r12 verdict asked for
// ("adjudicate pipeline_curate_v2 — if real, name the paying stage"):
// v2 regressed 1.23 → 1.88 s across r11→r12 while v3/v4 improved, and
// the in-suite solo re-run can't say WHICH of its five stages pays.
// Cumulative prefixes of the exact declared composition (SparkEntry
// `pipeline_curate_v2`), each timed min-of-2 after a warm-up run, so
// stage cost = adjacent difference. One JSON line →
// CURATE_PROBE_r{N}.json.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TextOps

object CurateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    docs.count() // scan warm-up

    def gated = TextOps.qualityGate(docs).select("doc_id")
    def contaminated = TextOps.contaminationHits(docs, n = 5)
      .select("doc_id")
    def clean = docs.join(gated, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val bagFp = md5(concat_ws(" ",
      array_sort(array_distinct(split(col("text"), " ")))).cast("binary"))
    def deduped = {
      val w = Window.partitionBy(bagFp).orderBy(col("doc_id"))
      clean.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    def sampled = TextOps.reservoirSample(deduped,
      Map("en" -> 40, "de" -> 20), default = 15)
    def full = sampled
      .join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text")).cast("long")).as("chars"))

    def timed(tag: String, f: => DataFrame): String = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // codegen warm-up
      val t = math.min(once(), once())
      println(f"[curate] $tag $t%.2fs")
      Console.flush()
      f""""$tag":$t%.3f"""
    }

    val cells = Seq(
      timed("gate", gated),
      timed("contamination", contaminated),
      timed("clean_join", clean),
      timed("dedup_window", deduped),
      timed("reservoir", sampled),
      timed("full_v2", full))
    println(s"""{"metric":"curate_probe","sf":"$dir",""" +
      s""""cum_sec":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}
