package graft

// Measurement tooling (dev/judge, not a driver surface): shuffle-
// reduction probe for `bloom_semijoin` (operators/BloomJoin). The
// declared query's dim broadcasts at every test SF, so the bloom's
// value is invisible in the bench number — the prefilter pays in the
// BIG-DIM regime where the semi-join becomes a shuffle on the fact.
// Two legs, min-of-2 each, both on the sfDir lineitem×part shape:
//   broadcast  — the plan the declared query executes (dim broadcasts;
//     bloom only thins the probe-side rows);
//   shuffled   — autoBroadcastJoinThreshold=-1 forces the exchange the
//     100 TB dim would force; the bloom cuts the fact-side exchange to
//     the candidate set (selectivity + false positives).
// Volume numbers (fact rows → candidates → exact, fp count, filter
// bytes) are scale-transferable facts independent of the wall numbers;
// the walls carry this host's ambient band like every probe capture.
// → BLOOM_PROBE_r{N}.json (append-only per the probe pinning rule).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

object BloomProbe {
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

    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.part(spark, sfDir).filter(col("p_size") >= 48)
      .select("p_partkey")
    val factRows = fact.count()
    val dimKeys = dim.count()

    val tb0 = System.nanoTime()
    val bloom = BloomJoin.buildBloom(dim, "p_partkey",
      expectedItems = 100000L)
    val buildS = (System.nanoTime() - tb0) / 1e9
    val candidates = fact
      .where(BloomJoin.mightContain(bloom, col("l_partkey"))).count()
    val exact = fact.join(dim, col("l_partkey") === col("p_partkey"),
      "left_semi").count()
    val fp = candidates - exact

    def minOf2(f: => Unit): Double = {
      f // codegen warm-up
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    def agg(withBloom: Boolean): Unit = {
      val pre = if (withBloom)
        fact.where(BloomJoin.mightContain(bloom, col("l_partkey")))
      else fact
      pre.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
        .count(): Unit
    }

    val legs = Seq("broadcast" -> "10485760", "shuffled" -> "-1").map {
      case (name, thresh) =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        val plain = minOf2(agg(withBloom = false))
        val bloomed = minOf2(agg(withBloom = true))
        println(f"[bloomprobe] $name plain=$plain%.3fs bloom=$bloomed%.3fs")
        Console.flush()
        f""""$name":{"plain_sec":$plain%.3f,"bloom_sec":$bloomed%.3f}"""
    }

    println(s"""{"metric":"bloom_semijoin_probe","sf":"$sfDir",""" +
      s""""fact_rows":$factRows,"dim_keys":$dimKeys,""" +
      s""""bloom_bytes":${bloom.length},""" +
      f""""bloom_build_sec":$buildS%.3f,""" +
      s""""candidates":$candidates,"exact":$exact,"false_positives":$fp,""" +
      f""""fact_reduction":${factRows.toDouble / candidates}%.1f,""" +
      s""""legs":{${legs.mkString(",")}}}""")
    spark.stop()
  }
}
