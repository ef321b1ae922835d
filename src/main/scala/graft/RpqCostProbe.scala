package graft

// Measurement tooling (dev/judge, not a driver surface): decomposes
// the residual-ADC tier's cost at a replicated corpus — SCALESMOKE_r11
// reads ann_ivf_rpq at 27.9 s / ratio 11.3 over factor 10 while the
// identical-volume pq_codes encode reads 0.8 s, so something in the
// query-side chain is pathological, and the pieces must be timed
// separately before anything is "fixed". One JSON line:
// per-stage warm times (min-of-2 after a warm-up action) for the
// residual-codes build, the full rpq query at probes 1 and 2, and the
// raw-vector ivfpq contrast, at ×1 and ×`factor` replicas.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object RpqCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb1 = Tables.embeddings(spark, dir)
    val stride = emb1.agg(max("vec_id")).first().getLong(0) + 1
    val base = java.nio.file.Files.createTempDirectory("graft_rpq").toString
    (0 until factor).map { i =>
      emb1.select((col("vec_id") + lit(i * stride)).as("vec_id"),
        col("embedding"))
    }.reduce(_.unionByName(_)).write.mode("overwrite")
      .parquet(s"$base/embeddings")
    val embN = spark.read.parquet(s"$base/embeddings")
    emb1.count(); embN.count()

    def time(f: => DataFrame): Double = {
      f.count() // warm-up: codegen + any lazy memo/checkpoint builds
      def once: Double = {
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    def legs(emb: DataFrame): Map[String, Double] = Map(
      "pq_codes" -> time(Similarity.pqCodes(spark, emb, 16, cw = 256)),
      "rpq_codes" -> time(Similarity.pqResidualCodes(spark, emb, 32, 128)),
      "rpq_p1" -> time(Similarity.annIvfRpq(spark, emb, 25, 5, 32, 128)),
      "rpq_p2" -> time(
        Similarity.annIvfRpq(spark, emb, 25, 5, 32, 128, probes = 2)),
      "ivfpq_p1" -> time(Similarity.annIvfPq(spark, emb, 25, 5, 16,
        cw = 256)))

    val r1 = legs(emb1)
    val rN = legs(embN)

    // Hypothesis leg: the residual relation is memo-pinned as a lazy
    // localCheckpoint whose partition count AQE coalesced at build
    // time; if the 82M-row assign chain downstream of that checkpoint
    // runs on too few cores, the whole family serializes. A FRESH
    // session (separate memo key space) with coalescing off rebuilds
    // the pinned relations at full parallelism.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val embN2 = s2.read.parquet(s"$base/embeddings")
    embN2.count()
    val rNno = Map(
      "rpq_codes" -> time(Similarity.pqResidualCodes(s2, embN2, 32, 128)),
      "rpq_p1" -> time(Similarity.annIvfRpq(s2, embN2, 25, 5, 32, 128)))
    def fmt(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"rpq_cost","factor":$factor,"sf":"$dir",""" +
      s""""x1":${fmt(r1)},"xN":${fmt(rN)},"xN_nocoalesce":${fmt(rNno)}}""")

    // temp replica cleanup (the MediaIvfProbe advice rule — walk,
    // not a recursive Files.list, which leaks its directory stream)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(base))
      .iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
    spark.stop()
  }
}
