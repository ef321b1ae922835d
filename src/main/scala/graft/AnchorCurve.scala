package graft
import org.apache.spark.sql.SparkSession

/** Measurement tooling (dev/judge, not a driver surface): 40
  * back-to-back samples of Bench's INTEGER calibration anchor on a
  * fresh JVM, printed as one curve — the instrument that adjudicated
  * the r15 refusal pattern. All four r15 same-code captures showed
  * pre ~0.28-0.34 s vs post ~0.20 s (> the 1.25x band on three of
  * them) at loadavg_pre 0.38-0.88; this curve shows a fresh JVM
  * PLATEAUS at ~0.27-0.29 s for 40 consecutive samples and never
  * reaches 0.20 — so the post-suite speedup is induced by the
  * suite's own sustained multi-minute load (cpufreq/boost state),
  * not by ambient load leaving. The anchor gate is therefore
  * refusing a SYSTEMATIC host ramp on this container; THROUGHPUT.md
  * "Round 15" carries the reading and the r16 option (settle the
  * pre anchor after a sustained warm-up rather than a convergence
  * loop). */
object AnchorCurve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def one(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 4000000L, 1, 32)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    val xs = (1 to 40).map(_ => one())
    println("[curve] " + xs.map(x => f"$x%.3f").mkString(" "))
    // Phase 2 (r15, the fix-decider): does DIVERSE sustained work —
    // the thing the suite does and an anchor-only loop does not —
    // close the pre/post gap? ~90 s of mixed string/join/window jobs,
    // then the anchor again. If it reads ~0.20 here, the drift is
    // JIT/host maturation reachable by a Bench-side warm-up; if it
    // stays ~0.27, the gap only opens under the full suite and the
    // gate needs a different fix.
    val burstEnd = System.nanoTime() + 90L * 1000000000L
    while (System.nanoTime() < burstEnd) {
      spark.range(0, 300000L, 1, 32)
        .selectExpr("concat_ws(' ', 'a', 'bb', 'ccc', CAST(id % 977 AS STRING)) AS s")
        .selectExpr("explode(split(s, ' ')) AS t")
        .groupBy("t").count().count()
      val l = spark.range(0, 500000L, 1, 32)
        .selectExpr("id % 4999 AS k", "id AS v")
      val r = spark.range(0, 5000L, 1, 8).selectExpr("id AS k", "id * 2 AS w")
      l.join(r, "k").groupBy(org.apache.spark.sql.functions.expr("k % 97"))
        .sum("w").count()
      spark.range(0, 200000L, 1, 32)
        .selectExpr("id % 1000 AS g", "id AS v")
        .selectExpr("g", "v", "row_number() OVER (PARTITION BY g ORDER BY v) AS rn")
        .where("rn <= 3").count()
    }
    val ys = (1 to 10).map(_ => one())
    println("[curve-postburst] " + ys.map(x => f"$x%.3f").mkString(" "))
    spark.stop()
  }
}
