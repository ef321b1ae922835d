package graft

// Measurement tooling (dev/judge, not a driver surface): diagnoses the
// r13 perturbed-smoke finding that `tfidf_cosine_capped` re-ran at
// ~20× for a ×10 corpus while candidates grew 10.6× — superlinear
// despite the completion prune. Hypothesis under test: the `dot_rare`
// aggregation (hundreds of millions of rows into ~88 M (d1, d2)
// groups) spills once per-partition group cardinality outgrows the
// fixed shuffle width (the smoke pins spark.sql.shuffle.partitions =
// cpus = 32), so the fix dial is SHUFFLE WIDTH, not plan shape. Times
// the capped op over a pre-built perturbed corpus (args: corpus dir)
// at several shuffle widths in one session (runtime-settable conf).
// One JSON line → TFIDF_CAPSCALE_r{N}.json.
import org.apache.spark.sql.SparkSession
import graft.operators.TextOps

object TfidfCapScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: TfidfCapScaleProbe <perturbedCorpusDir>"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(dir)
    docs.count() // scan warm-up

    def timed(tag: String)(f: => Long): String = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"[capscale] $tag $t%.2fs")
      Console.flush()
      f""""$tag":$t%.3f"""
    }

    // cumulative stage prefixes of the capped op (mirrors
    // TextOps.tfidfCosinePairsCapped), plus the uncapped op as the
    // same-corpus reference — stage cost = adjacent difference
    import org.apache.spark.sql.functions._
    val D = 1600L
    def vec = TextOps.salientVectors(docs, 10).localCheckpoint(eager = false)
    val cells = {
      val v = vec
      val spreadDf = v.repartition(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      val counts = v.groupBy("token").agg(count(lit(1)).as("pc"))
        .localCheckpoint(eager = false)
      val rare = broadcast(counts.filter(col("pc") <= D).select("token"))
      val genBuild = v.join(rare, "token")
      def gen = spreadDf.join(rare, "token").as("a")
        .join(broadcast(genBuild.as("b")),
          col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          (col("a.wq") * col("b.wq")).as("w"))
      def dotRare = gen.groupBy("d1", "d2").agg(sum(col("w")).as("dot_rare"))
      Seq(
        timed("vec")(vec.count()),
        timed("gen")(gen.count()),
        timed("dot_rare")(dotRare.count()),
        timed("full_capped")(TextOps.tfidfCosinePairsCapped(docs, k = 10,
          thresholdHundredths = 60, maxPostings = D).count()),
        timed("full_uncapped")(TextOps.tfidfCosinePairs(docs, k = 10,
          thresholdHundredths = 60).count()))
    }
    println(s"""{"metric":"tfidf_capscale","dir":"$dir",""" +
      s""""sec":{${cells.mkString(",")}}}""")
    spark.stop()
  }
}
