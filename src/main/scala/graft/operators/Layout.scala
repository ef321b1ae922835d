package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — Z-order (Morton) clustering for lake writes
  * (north-star extension; the reference writes flat CSVs).
  *
  * At 100 TB the scan you DON'T do is the cheapest operator in the
  * engine: parquet keeps per-row-group min/max stats on every column,
  * and Spark's pushed filters skip row groups whose stat range misses
  * the predicate — but stats only prune if the layout CLUSTERS each
  * column's values, and sorting by one column destroys clustering on
  * every other. The Z-order curve interleaves the bits of two key
  * columns so files are tight rectangles in (a, b) space: a box
  * predicate on EITHER or BOTH keys touches only the files whose
  * rectangle overlaps the box (measured: ZORDER_PROBE artifact).
  *
  * Everything is plain column arithmetic (shift/mask/or — whole-stage
  * codegen, bit-identical in DuckDB's integer ops, so the key itself
  * is oracle-checkable), and the write path is
  * `repartitionByRange(z) + sortWithinPartitions(z)` — one range
  * exchange, the same shuffle a plain sorted write pays.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Inputs are masked to `bits` — callers
    * bucket wider domains first (quantile-bucket or `% 2^bits`); the
    * mask keeps the key total-ordered and both engines two's-complement
    * agree even on negative inputs.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { k =>
      Seq(
        shiftleft(shiftright(a.cast("long"), k).bitwiseAND(lit(1L)), 2 * k),
        shiftleft(shiftright(b.cast("long"), k).bitwiseAND(lit(1L)),
          2 * k + 1))
    }
    terms.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** The DuckDB spelling of [[zValue]] — mechanically unrolled so the
    * oracle computes the identical key bit-for-bit. */
  def sqlZValue(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { k =>
      Seq(s"((($a >> $k) & 1) << ${2 * k})",
        s"((($b >> $k) & 1) << ${2 * k + 1})")
    }.mkString("(", " | ", ")")

  /** Z-order-clustered parquet write: range-partition on the Morton key
    * into `numFiles` tight z-ranges, sort within each, drop the key.
    * One range exchange (sampled bounds), then a local sort — the same
    * cost as any sorted write; the payoff is every later box scan.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Files a predicate actually has to read under a given layout — the
    * layout audit number (files whose contents intersect the predicate;
    * parquet stats let the scan skip the rest when one row group spans
    * a file). */
  def filesTouched(df: DataFrame, pred: Column): Long =
    df.where(pred).select(input_file_name()).distinct().count()
}
