package graft

import java.sql.Timestamp
import graft.operators.Temporal

/** As-of and bucketed-range join edge semantics on hand-built inputs. */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s")

  test("asOfJoin picks the latest right row at or before each left ts") {
    val purchases = Seq(
      (1L, ts("10:00:00"), 100L), // click at exactly 10:00 counts (<=)
      (1L, ts("10:30:00"), 101L), // latest prior is 10:05
      (2L, ts("09:00:00"), 102L)  // no prior click → dropped (inner)
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, ts("10:00:00"), 1L),
      (1L, ts("10:05:00"), 2L),
      (2L, ts("09:30:00"), 3L)    // after the purchase → not eligible
    ).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
      Seq("purchase_id"), Seq("click_id"))
      .orderBy("purchase_id").collect()
    assert(out.map(_.getAs[Long]("purchase_id")).toSeq === Seq(100L, 101L))
    assert(out.map(_.getAs[Long]("r_click_id")).toSeq === Seq(1L, 2L))
    assert(out(1).getAs[Timestamp]("r_ts") === ts("10:05:00"))
  }

  test("asOfJoin carries the newest right row's fields, NULLs included") {
    // The matched right row's NULL payload must come through as NULL —
    // not be backfilled from an older right row (which would fabricate
    // a row that never existed).
    val purchases = Seq((1L, ts("10:30:00"), 100L))
      .toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, ts("09:00:00"), Some(7L)),
      (1L, ts("10:00:00"), None) // newest prior click, NULL payload
    ).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
      Seq("purchase_id"), Seq("click_id")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Timestamp]("r_ts") === ts("10:00:00"))
    assert(out.head.isNullAt(out.head.fieldIndex("r_click_id")))
  }

  test("asOfJoinTolerance drops matches staler than the bound") {
    val purchases = Seq(
      (1L, ts("10:00:00"), 100L), // prior click 09:55 → 5 min old: kept
      (1L, ts("11:00:00"), 101L), // latest prior still 09:55 → 65 min: dropped
      (2L, ts("10:30:00"), 102L)  // prior click at exactly the bound: kept
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (1L, ts("09:55:00"), 1L),
      (2L, ts("10:00:00"), 2L)    // exactly 30 min before 102 (<= bound)
    ).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoinTolerance(purchases, clicks, "user_id", "ts",
      toleranceSeconds = 1800L, Seq("purchase_id"), Seq("click_id"))
      .orderBy("purchase_id").collect()
    assert(out.map(_.getAs[Long]("purchase_id")).toSeq === Seq(100L, 102L))
    assert(out.map(_.getAs[Long]("r_click_id")).toSeq === Seq(1L, 2L))
  }

  test("rangeJoinBucketed counts a half-open window across bucket borders") {
    val errors = Seq((1L, ts("10:10:00"))).toDF("user_id", "ts")
    val clicks = Seq(
      (1L, ts("10:04:59")), // 301s before → outside
      (1L, ts("10:05:00")), // exactly window seconds before → inside (>=)
      (1L, ts("10:07:30")), // inside, previous bucket
      (1L, ts("10:09:59")), // inside, same bucket
      (1L, ts("10:10:00")), // equal ts → outside (strict <)
      (2L, ts("10:09:00"))  // other user
    ).toDF("user_id", "ts")
    val out = Temporal.rangeJoinBucketed(errors, clicks, "user_id", "ts",
      windowSeconds = 300L, countAs = "n").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n") === 3L)
  }

  test("rangeJoinBucketed keeps zero-count left rows") {
    val errors = Seq((1L, ts("10:00:00"))).toDF("user_id", "ts")
    val clicks = Seq((1L, ts("11:00:00"))).toDF("user_id", "ts")
    val out = Temporal.rangeJoinBucketed(errors, clicks, "user_id", "ts",
      300L, "n").collect()
    assert(out.length === 1 && out.head.getAs[Long]("n") === 0L)
  }

  test("asOfJoin never matches NULL keys (SQL equality semantics)") {
    // A NULL-key purchase must not pair with a NULL-key click even when
    // both land in the same hash partition.
    val purchases = Seq(
      (Option.empty[Long], ts("10:30:00"), 100L),
      (Some(1L), ts("10:30:00"), 101L)
    ).toDF("user_id", "ts", "purchase_id")
    val clicks = Seq(
      (Option.empty[Long], ts("10:00:00"), 1L),
      (Some(1L), ts("10:00:00"), 2L)
    ).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
      Seq("purchase_id"), Seq("click_id")).collect()
    assert(out.map(_.getAs[Long]("purchase_id")).toSeq === Seq(101L))
    assert(out.head.getAs[Long]("r_click_id") === 2L)
  }
}
