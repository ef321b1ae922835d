package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  * An untimed warm-up action absorbs JVM/session/parquet-footer startup
  * so per-query numbers measure the queries, not the cold JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up (untimed): JVM classloading, codegen, parquet footers.
    Tables.All.foreach(t => Tables.load(spark, sfDir, t).count())

    // Timed repeats per query, report the MINIMUM: container CPU
    // contention swings single-shot totals ±30%, and min-of-k is the
    // standard noise floor estimator for a deterministic workload.
    // Sub-second queries get a THIRD repeat: noise there is a large
    // multiple of the true time (a ±0.3 s swing doubles a 0.3 s query),
    // so two samples routinely report phantom 2× regressions; the extra
    // repeat costs <1 s each by construction.
    // Dev-only subset filter (SPARK_GRAFT_ONLY=q1,q2) for tuning a hot
    // query without paying for the whole suite; driver sets it never.
    // Trimmed + validated: a typo'd name would otherwise bench an empty
    // suite and print a suspiciously fast "clean" total.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not declared: " +
        unknown.toSeq.sorted.mkString(", "))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            // a failed query must be visible, not a plausible elapsed time
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      val t1 = once()
      // don't re-run a failing query — a slow failure would double the
      // wall cost with no effect on the reported -1.0
      name -> (if (t1 < 0) -1.0
      else {
        val best2 = math.min(t1, once() match {
          case t2 if t2 >= 0 => t2
          case _ => t1
        })
        if (best2 >= 1.0) best2
        else math.min(best2, once() match {
          case t3 if t3 >= 0 => t3
          case _ => best2
        })
      })
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total counts successful queries only — summing the -1.0 failure
    // sentinels would make a broken run look faster than a clean one
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
