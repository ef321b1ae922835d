package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event streams — operators Spark lacks natively
  * (the build brief's "as-of join, range join" case). Both are COMPOSED
  * from built-in operators (preference (a): composition before custom
  * plans), shaped so the composition scales:
  *
  *  - [[asOfJoin]]: union + running last-value window — one shuffle on
  *    the key, state is one row per key at any point of the scan, no
  *    join explosion. The DuckDB oracle runs its NATIVE `ASOF JOIN`
  *    against this composition, so the semantics are checked against an
  *    engine that implements the operator directly.
  *  - [[rangeJoinBucketed]]: time-range join as an equi-join on a coarse
  *    time bucket (candidates = own + previous bucket) plus the exact
  *    residual predicate — the standard trick that turns an
  *    O(n·m) inequality join (Spark would nested-loop it) into a
  *    hash join with bounded candidate fan-out.
  */
object Temporal {

  /** For each left row, attach the most recent right row with
    * `right.ts <= left.ts` for the same key (inner as-of semantics: left
    * rows with no prior right row are dropped).
    *
    * Implementation: tag both sides, union, and run a running
    * `last_value` window per key ordered by (ts, side) — right rows sort
    * before left rows at equal ts, so `<=` matches DuckDB's ASOF bound.
    * Right side must be unique per (key, ts) for the operator to be
    * deterministic (pre-aggregate upstream if not).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    // NULL timestamps can never satisfy the as-of bound (ASOF's
    // `r.ts <= l.ts` predicate is non-true for NULL on either side) —
    // without this filter a NULL-ts right row would sort first in the
    // window and masquerade as an "earliest prior match".
    // NULL keys are dropped on both sides: the union-window trick hash-
    // partitions by key, which would otherwise group NULL with NULL and
    // invent matches SQL ASOF equality semantics (NULL = NULL → false)
    // never produce.
    val lv = left.filter(col(ts).isNotNull && col(key).isNotNull)
    val rv = right.filter(col(ts).isNotNull && col(key).isNotNull)
    // The right payload travels as ONE struct through a single last()
    // window: independent per-column windows would skip NULL payload
    // fields back to an OLDER right row, stitching together a row that
    // never existed (DuckDB's native ASOF returns the newest row's
    // fields, NULLs included).
    val rStruct = struct(
      (col(ts).as("r_ts") +: rightCols.map(c => col(c).as(s"r_$c"))): _*)
    val lTagged = lv.select(
      (col(key).as(key) +: col(ts).as(ts) +: lit(1).as("side") +:
        leftCols.map(c => col(c).as(c)) ++:
        Seq(lit(null).cast(right.select(rStruct).schema.head.dataType).as("r"))): _*)
    val rTagged = rv.select(
      (col(key).as(key) +: col(ts).as(ts) +: lit(0).as("side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        Seq(rStruct.as("r"))): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("r"), ignoreNulls = true).over(w).as("r")
    lTagged.unionByName(rTagged)
      .select((col(key) +: col(ts) +: col("side") +:
        leftCols.map(col) ++: Seq(carried)): _*)
      .filter(col("side") === 1 && col("r").isNotNull)
      .select((col(key) +: col(ts) +: leftCols.map(col) ++:
        (col("r.r_ts").as("r_ts") +:
          rightCols.map(c => col(s"r.r_$c").as(s"r_$c")))): _*)
  }

  /** [[asOfJoin]] with a staleness bound — pandas `merge_asof`'s
    * `tolerance` parameter: the latest prior right row matches only if
    * it is at most `toleranceSeconds` old at the left row's timestamp
    * (inner semantics: left rows whose only prior match is staler are
    * dropped, exactly as if no match existed). The bound is an integer
    * microsecond comparison applied AFTER the single as-of window, so
    * it adds no shuffle and stays engine-exact; DuckDB's native ASOF
    * has no tolerance clause, so the oracle expresses it the same way —
    * a residual filter on the ASOF result. */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, toleranceSeconds: Long,
                        leftCols: Seq[String],
                        rightCols: Seq[String]): DataFrame =
    asOfJoin(left, right, key, ts, leftCols, rightCols)
      .filter(unix_micros(col(ts)) - unix_micros(col("r_ts")) <=
        toleranceSeconds * 1000000L)

  /** Count right-side rows per left row within `[left.ts - window,
    * left.ts)` for the same key. Bucketing: both sides bucket ts by
    * `window`; a candidate right row lives in the left row's bucket or
    * the one before; the exact half-open interval is re-checked as a
    * residual predicate after the equi-join on (key, bucket).
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                        ts: String, windowSeconds: Long,
                        countAs: String): DataFrame = {
    val bucket = (unix_micros(col(ts)) / (windowSeconds * 1000000L)).cast("long")
    val l = left.select(col(key), col(ts).as("l_ts"), bucket.as("b"))
    // The count is a function of (key, ts) alone, so aggregate per
    // distinct (key, ts) and join back on those VALUES — a synthetic
    // row id (monotonically_increasing_id) would be non-deterministic
    // across the two evaluations of the left plan on a real cluster.
    val lKeys = l.distinct()
    val lExp = lKeys.withColumn("cand_b", explode(array(col("b"), col("b") - 1)))
    val r = right.select(col(key), col(ts).as("r_ts"), bucket.as("cand_b"))
    val joined = lExp.join(r, Seq(key, "cand_b"))
      .filter(col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("r_ts") < col("l_ts"))
      .groupBy(key, "l_ts").agg(count(lit(1)).as(countAs))
    l.join(joined, Seq(key, "l_ts"), "left")
      .select(col(key), col("l_ts").as(ts),
        coalesce(col(countAs), lit(0L)).as(countAs))
  }
}
