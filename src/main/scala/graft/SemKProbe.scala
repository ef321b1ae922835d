package graft

// Measurement tooling (dev/judge, not a driver surface): sweeps the
// semantic tier's codebook size k and records, per k, the intra-cluster
// candidate pair count and the full semdedup wall time on the SAME
// corpus. This is the artifact behind the 100 TB claim for the k-knob
// Lloyd codebook (graft.operators.Similarity.lloydBook): candidate mass
// is O(Σ|cluster|²) ≈ O(N²/k), so the count must FALL as k rises —
// k = 0 rows the legacy label-derived book (k pinned to #labels) for
// comparison. One JSON line, ContainmentProbe's format family.
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

object SemKProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.SemKProbe <sfDir> [k,k,...]")
    val sfDir = args(0)
    val ks = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(0, 8, 16, 32, 64, 128))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count() // scan warm-up + the N the sweep is judged at

    // warm codegen on BOTH codebook paths (Lloyd build and the legacy
    // label-derived book) so per-k deltas are not compilation noise
    Similarity.semDedup(spark, emb, 35, k = ks.max.max(1), rounds = 2).count()
    if (ks.contains(0)) Similarity.semDedup(spark, emb, 35, k = 0).count()

    val rows = ks.map { k =>
      val t0 = System.nanoTime()
      val cand = Similarity.semDedupCandidates(spark, emb, k = k, rounds = 2)
        .count()
      val full = Similarity.semDedup(spark, emb, 35, k = k, rounds = 2)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[semk] k=$k%-4d cand=$cand%9d kept_rows=$full%7d ${secs}%6.2fs")
      Console.flush()
      f"""{"k":$k,"cand":$cand,"rows":$full,"sec":${secs}%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"semk_probe","sf":"$sfDir","n":$n,"rounds":2,"sweep":[$rows]}""")
    spark.stop()
  }
}
