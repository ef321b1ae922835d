package graft

// Measurement tooling (dev/judge, not a driver surface): diagnoses the
// r13 perturbed-smoke overshoot on `dedup_minhash_lsh` — 15.3× wall
// for a ×10 corpus whose genuine banded-pair output grew 9.8×
// (SCALESMOKE_r13.json). Two questions, one JSON line:
//   stages — cumulative prefixes (signatures → banded join+kernel →
//     pair dedup groupBy) so the superlinear stage is named, not
//     guessed;
//   width — the full op at shuffle widths 32/128/512: if the pair
//     dedup's per-partition hash map is spilling at the smoke's fixed
//     width (= cpus = 32), wider shuffles flatten the curve and the
//     finding is "size shuffle.partitions with the pair volume" (the
//     cluster dial), not a plan defect.
// → MINHASH_SCALE_r{N}.json.
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: MinhashScaleProbe <corpusDir>"))
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
      println(f"[minhashscale] $tag $t%.2fs")
      Console.flush()
      f""""$tag":$t%.3f"""
    }

    val stages = Seq(
      timed("sigs")(Dedup.minhashSignatures(docs, 32).count()),
      // the raw-path banded join WITHOUT the final pair dedup: the
      // emission + native estimate kernel volume
      timed("full")(Dedup.minhashLshPairsRaw(docs, 32, 8).count()))

    val widths = Seq(32, 128, 512).map { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t = {
        def once(): Double = {
          val t0 = System.nanoTime()
          Dedup.minhashLshPairsRaw(docs, 32, 8).count()
          (System.nanoTime() - t0) / 1e9
        }
        once(); math.min(once(), once())
      }
      println(f"[minhashscale] width=$parts $t%.2fs")
      Console.flush()
      f""""p$parts":$t%.3f"""
    }
    println(s"""{"metric":"minhash_scale","dir":"$dir",""" +
      s""""sec":{${stages.mkString(",")}},""" +
      s""""width_sec":{${widths.mkString(",")}}}""")
    spark.stop()
  }
}
