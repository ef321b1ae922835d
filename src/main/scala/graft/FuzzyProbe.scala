package graft

// Measurement tooling (dev/judge, not a driver surface): decomposes
// fuzzy_components — the most expensive r7 query — into its pipeline
// stages so "pairs-bound or CC-bound" is a committed number, not an
// argument (the CONTAINMENT_PROBE treatment, per the r7 verdict).
// Stages (cumulative count actions; a stage's own cost is the delta
// from the previous line):
//   1. keyed   — distinct names + canonical min-id
//   2. pairs   — FastSS (variant,pos)-blocked ED-1 self-join
//   3. cc      — connected components over the pair graph (+rounds)
//   4. full    — the declared editDistanceComponents query
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.FuzzyProbe <sfDir>")
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
    val cust = Tables.customer(spark, sfDir)
    cust.count() // scan warm-up

    // UNIFORM per-stage warm-up + min-of-2 (the r8 artifact's stage
    // times were internally inconsistent — cc 4.31 s > full 3.39 s —
    // because only `full` was warmed, so each earlier stage carried
    // its own first-run codegen/shuffle-init inside the clock and a
    // single sample had no noise floor; stages must sum sensibly for
    // the artifact to adjudicate the next fuzzy regression)
    def timed(name: String)(f: => Long): (String, Double, Long) = {
      f // stage-specific codegen + shuffle-file warm-up, untimed
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (s1, n) = once()
      val secs = math.min(s1, once()._1)
      println(f"[fuzzy] $name%-8s ${secs}%7.2fs rows=$n%d")
      Console.flush()
      (name, secs, n)
    }

    // the keyed relation exactly as editDistanceComponents builds it
    def keyed = cust
      .select(col("c_name").cast("string").as("n"),
        col("c_custkey").cast("long").as("kid"))
      .filter(col("n").isNotNull && length(col("n")) >= 1)
      .groupBy("n").agg(min("kid").as("kid"))

    var rounds = -1
    val stages = Seq(
      timed("keyed") { keyed.count() },
      timed("id_pairs") { Dedup.editDistanceIdPairs(keyed).count() },
      timed("cc") {
        val (labels, r) =
          Dedup.connectedComponentsWithRounds(Dedup.editDistanceIdPairs(keyed))
        rounds = r
        labels.count()
      },
      timed("full") {
        Dedup.editDistanceComponents(cust, "c_name", "c_custkey").count()
      })

    def fmt(v: Double) = f"$v%.3f"
    val js = stages.map { case (n, s, r) =>
      s""""$n":{"sec":${fmt(s)},"rows":$r}""" }.mkString(",")
    println(s"""{"metric":"fuzzy_probe","sf":"$sfDir","cc_rounds":$rounds,$js}""")
    spark.stop()
  }
}
