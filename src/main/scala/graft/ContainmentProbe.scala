package graft

// Measurement tooling (dev/judge, not a driver surface): decomposes
// dedup_containment's cost — the heaviest bench query since round 5 —
// into its pipeline stages so "where do the seconds go" is a committed
// number, not an argument. Stages (each timed as a cumulative count
// action; a stage's own cost is the delta from the previous line):
//   1. quotient   — bag-class collapse to representatives
//   2. candidates — rare-first one-sided prefix join + distinct
//   3. rep pairs  — sorted-merge verify at the representative level
//   4. full       — member-wise expansion (cross + intra at C = 1)
// plus the raw (pre-distinct) candidate multiplicity, which prices the
// distinct's shuffle.
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ContainmentProbe <sfDir> [thresholdTenths]")
    val sfDir = args(0)
    val t = args.lift(1).map(_.toInt).getOrElse(9)
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
      println(f"[containment] $name%-12s ${secs}%7.2fs rows=$n%d")
      Console.flush()
      (name, secs, n)
    }

    // warm codegen on the full query once so stage deltas are not
    // dominated by first-run compilation
    Dedup.containmentPairs(docs, t).count()

    val stages = Seq(
      timed("quotient") { Dedup.containmentRepDocs(docs).count() },
      timed("candidates") { Dedup.containmentCandidates(docs, t).count() },
      timed("rep_pairs") { Dedup.containmentRepPairs(docs, t).count() },
      timed("full") { Dedup.containmentPairs(docs, t).count() })

    def fmt(v: Double) = f"$v%.3f"
    val js = stages.map { case (n, s, r) =>
      s""""$n":{"sec":${fmt(s)},"rows":$r}""" }.mkString(",")
    println(s"""{"metric":"containment_probe","sf":"$sfDir","t":$t,$js}""")
    spark.stop()
  }
}
