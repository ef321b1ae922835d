package graft

// Measurement tooling (dev/judge, not a driver surface): scaling probe
// for `dedup_minhash_lsh` (r13: 15.3× wall for a ×10 perturbed corpus
// whose banded-pair output grew 9.8× — adjudicated as cache-band
// memory-hierarchy throughput, shuffle-width-insensitive). r14 extends
// it on two axes the r13 capture left open:
//   stages — THREE cumulative prefixes per scale factor (signatures →
//     banded join + native estimate kernel → + the final pair-dedup
//     groupBy), closing the r13 ADVICE gap where the header promised
//     the pair dedup but only two prefixes were timed;
//   scale — factors 1/10/30 of the perturbed replica, with banded-pair
//     counts and pairs/s per factor: the r13 reading ("volume-true,
//     per-pair throughput drops off the ×1 cache-resident band, then
//     plateaus") predicts pairs/s ≈ FLAT ×10→×30; superlinear cost
//     would show it falling further.
//   width — the full op at shuffle widths 32/128/512 on the largest
//     factor (flat = no spill; the cluster dial is not the issue).
// → MINHASH_SCALE_r{N}.json (append-only per the probe pinning rule:
// re-runs within a round bump a capture suffix, never overwrite).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 30))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.documents(spark, sfDir)
    val stride = docs1.agg(max("doc_id")).first().getLong(0) + 1
    val base = java.nio.file.Files
      .createTempDirectory("graft_minhashscale_").toString

    def minOf2(f: => Unit): Double = {
      f // codegen warm-up
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val legs = factors.map { factor =>
      // the smoke's perturbed replica: copies share zero vocabulary,
      // so banded-pair volume grows ×factor by construction
      val dir = s"$base/perturbed_x$factor"
      ScaleSmoke.perturbedDocs(docs1, factor, stride)
        .write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      docs.count() // scan warm-up
      val pairs = Dedup.minhashLshPairsRaw(docs, 32, 8).count()
      val sigs = minOf2(Dedup.minhashSignatures(docs, 32).count(): Unit)
      val raw = minOf2(Dedup.minhashLshPairsRaw(docs, 32, 8).count(): Unit)
      val full = minOf2(Dedup.minhashLshPairs(docs).count(): Unit)
      val pps = pairs / full
      println(f"[minhashscale] x$factor sigs=$sigs%.2fs raw=$raw%.2fs " +
        f"full=$full%.2fs pairs=$pairs pairs_per_sec=$pps%.0f")
      Console.flush()
      f""""x$factor":{"sigs":$sigs%.3f,"raw":$raw%.3f,"full":$full%.3f,""" +
        f""""pairs":$pairs,"pairs_per_sec":$pps%.0f}"""
    }

    val widths = Seq(32, 128, 512).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val docs = spark.read.parquet(s"$base/perturbed_x${factors.max}")
      val t = minOf2(Dedup.minhashLshPairs(docs).count(): Unit)
      println(f"[minhashscale] width=$parts $t%.2fs")
      Console.flush()
      f""""p$parts":$t%.3f"""
    }
    println(s"""{"metric":"minhash_scale","sf":"$sfDir",""" +
      s""""factors":{${legs.mkString(",")}},""" +
      s""""width_sec_x${factors.max}":{${widths.mkString(",")}}}""")
    spark.stop()
  }
}
