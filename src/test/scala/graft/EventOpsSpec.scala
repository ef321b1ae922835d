package graft

import java.sql.Timestamp
import graft.operators.EventOps

/** Funnel and retention operators against hand-built user journeys. */
class EventOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel counts users whose stages occur in order") {
    val events = Seq(
      // u1: full ordered journey
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0, ""),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 0.0, ""),
      // u2: clicked BEFORE signing up — stalls at stage 1
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0, ""),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0, ""),
      // u3: no signup — never enters the funnel
      (6L, ts("2024-01-01 10:00:00"), 3L, "click", 0.0, ""),
      (7L, ts("2024-01-01 10:05:00"), 3L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnel(events, Seq("signup", "click", "purchase"))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("users")))
    assert(out.toSeq === Seq(
      (1, "signup", 2L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("a same-timestamp stage event satisfies the order (>= semantics)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, ""),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.funnel(events, Seq("signup", "click"))
      .orderBy("stage").collect().map(_.getAs[Long]("users"))
    assert(out.toSeq === Seq(1L, 1L))
  }

  test("retention assigns week-granular cohorts from the first event") {
    // 2024-01-01 is a Monday; u1's cohort is that week, u2 joins a week
    // later. week_k counts whole weeks from the cohort Monday.
    val events = Seq(
      (1L, ts("2024-01-03 10:00:00"), 1L, "click", 0.0, ""), // first → W0
      (2L, ts("2024-01-05 10:00:00"), 1L, "view", 0.0, ""),  // same week
      (3L, ts("2024-01-09 10:00:00"), 1L, "view", 0.0, ""),  // week_k 1
      (4L, ts("2024-01-10 10:00:00"), 2L, "click", 0.0, "")  // cohort W1
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.retentionCohorts(events)
      .orderBy("cohort_week", "week_k").collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        r.getAs[Long]("week_k"), r.getAs[Long]("users")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("mad outliers apply Hampel's rule with exact picked medians") {
    import spark.implicits._
    // group g: median of (1..7, 100) picks 4 (disc, lower-of-middle);
    // adevs |x-4| = 3,2,1,0,1,2,3,96 -> MAD picks 2; 3*MAD = 6 ->
    // only 100 (adev 96) is an outlier. Group h: constant values,
    // MAD 0, nothing beats 0 by >0... except any deviation; all equal
    // so zero outliers.
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0).map(("g", _)) ++
      Seq(5.0, 5.0, 5.0).map(("h", _))).toDF("grp", "v")
    val out = EventOps.madOutliers(df, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("med"),
        r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"),
        r.getAs[Long]("outlier_ppm"))).toMap
    assert(out("g") === ((8L, 4.0, 2.0, 1L, 125000L)))
    assert(out("h") === ((3L, 5.0, 0.0, 0L, 0L)))
  }

  test("rollup merge of any batch split equals the full recompute") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 1.25), (1L, "click", 2.50), (1L, "view", 0.10),
      (2L, "click", 9.99), (2L, "view", 0.01), (3L, "buy", 100.00)
    ).toDF("user_id", "event_type", "value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val full = rows(EventOps.rollup(ev))
    assert(full.contains((1L, "click", 2L, 375L))) // 125 + 250 cents
    // merge ≡ recompute under an arbitrary 3-way split, any merge order
    val parts = Seq(1, 2, 3)
      .map(u => EventOps.rollup(ev.filter(s"user_id = $u")))
    assert(rows(EventOps.rollupMerge(parts: _*)) === full)
    assert(rows(EventOps.rollupMerge(parts.reverse: _*)) === full)
    // re-merging a merged state with an empty delta is a no-op
    val merged = EventOps.rollupMerge(parts: _*)
    assert(rows(EventOps.rollupMerge(merged,
      EventOps.rollup(ev.limit(0)))) === full)
  }
}
