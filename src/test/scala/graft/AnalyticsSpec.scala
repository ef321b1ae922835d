package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.sources.ResultsCsv

/** Visualizer-query parity (SURVEY.md §2.3 A7-A16) against the
  * reference-shape fixture corpus (FIXTURES.md §B.3): 9 CSV schema
  * dialects, comma decimals, missing algo, broken speedup columns. */
class AnalyticsSpec extends SparkSpec {

  private val fixtureDir = "src/test/resources/results_csv"

  private lazy val raw = ResultsCsv.readResultsDir(spark, fixtureDir)
  private lazy val cleaned = Analytics.cleanResults(raw).cache()

  test("drift union covers all 9 schemas and tags source_file (G8/A9)") {
    assert(raw.select("source_file").distinct().count() === 10)
    // Union column set: the 22 data columns + source_file.
    assert(raw.columns.length === 23)
  }

  test("locale cleanup turns comma decimals into doubles (A7/A8)") {
    // results_c_opt_* carries "47,205" style values.
    val t = cleaned
      .filter(col("source_file") === "results_c_opt_20251111_161057.csv" &&
        col("size") === 384)
      .select("avg_time_ms").collect().head.getDouble(0)
    assert(t === 47.205)
  }

  test("cleanNumeric coerces malformed values to NULL under ANSI mode") {
    import spark.implicits._
    val dirty = Seq(("c", "n/a"), ("c", "1,5"), ("c", "")).toDF("lang", "t")
    val out = Analytics.cleanNumeric(dirty).select("t").collect()
    assert(out.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ===
      Seq(null, 1.5, null))
  }

  test("parseExtra yields NULL when a key is absent (no-match regexp)") {
    import spark.implicits._
    val df = Seq("{}", "{'block': 32}").toDF("extra")
    val out = Analytics.parseExtra(df).collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2)) // neither key
    assert(out(1).getLong(1) === 32L && out(1).isNullAt(2)) // block only
  }

  test("numeric coercion yields NULL on failure, not errors (A8)") {
    // Stage-1 files have no threads column: NULL after union+cast.
    assert(cleaned.filter(col("source_file").startsWith("results_c_2") &&
      col("threads").isNotNull).count() === 0)
  }

  test("missing algo defaults to unknown (A16)") {
    val algos = cleaned
      .filter(col("source_file") === "results_python_20251019_230822.csv")
      .select("algo").distinct().collect().map(_.getString(0))
    assert(algos.toSeq === Seq("unknown"))
  }

  test("lang normalization lowercases drifting spellings (A15)") {
    // Stage-3 C/Java fixtures carry 'C' and 'Java'.
    val langs = cleaned.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs === Set("c", "java", "python"))
  }

  test("dense/sparse split (A10)") {
    assert(Analytics.denseAlgos(cleaned).select("algo").distinct().count() === 3)
    val sparse = Analytics.sparseAlgos(cleaned)
    assert(sparse.count() === 2) // java + python sparse rows
  }

  test("distinctSorted returns ordered dimension values (A13)") {
    val sizes = Analytics.distinctSorted(cleaned.filter(col("threads").isNotNull), "size")
      .collect().map(_.getDouble(0))
    assert(sizes.toSeq === Seq(512.0, 1024.0))
  }

  test("memory column selection per lang with peak fallback (A14)") {
    assert(Analytics.memoryColumn(cleaned, "c").contains("rss_peak_mb"))
    assert(Analytics.memoryColumn(cleaned, "java").contains("heap_peak_mb"))
    assert(Analytics.memoryColumn(cleaned, "python").contains("psutil_peak_rss_mb"))
    // Unknown lang falls back to the first column containing "peak".
    assert(Analytics.memoryColumn(cleaned, "rust").exists(_.contains("peak")))
  }

  test("corrected speedup/efficiency fixes the reference's broken columns (A4/Q1)") {
    // The fixture CSVs carry speedup=1.000 at p=8 and 0.000 at p=4 (the
    // reference's in-process-T1 bug); the window computation recovers the
    // real ratios from raw times.
    val perThread = Analytics.avgTime(
      cleaned.filter(col("threads").isNotNull),
      Seq("lang", "size", "threads"), "avg_time_ms")
    val se = Analytics.speedupEfficiency(perThread)
    val py8 = se.filter(col("lang") === "python" && col("threads") === 8)
      .select("speedup").collect().head.getDouble(0)
    // T1 = mean(72500.1, 72100.3, 72068.3) = 72222.9; T8 = 15704.4
    assert(math.abs(py8 - 72222.9 / 15704.4) < 1e-9)
    // C has no threads=1 fixture run → speedup NULL, not 0.000.
    val c4 = se.filter(col("lang") === "c" && col("threads") === 4)
      .select("speedup").collect()
    assert(c4.forall(_.isNullAt(0)))
  }

  test("extra column parses in both dialects (C/Java vs Python)") {
    val parsed = Analytics.parseExtra(cleaned.filter(col("extra").isNotNull))
    val blocks = parsed.select("block").distinct().collect().map(_.getLong(0))
    assert(blocks.toSeq === Seq(64L))
    // "0.050" (C/Java dialect) and "0.05" (Python dialect) are one value.
    val densities = parsed.select("density").distinct().collect().map(_.getDouble(0))
    assert(densities.toSeq === Seq(0.05))
  }
}
