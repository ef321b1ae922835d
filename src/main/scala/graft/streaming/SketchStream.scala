package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.operators.Sketches

/** Keyed hash row for the streaming KMV sketch (top-level — Dataset
  * encoders require it). */
case class KmvIn(grp: String, h: Long)

/** KMV state: the k smallest DISTINCT hashes seen so far, ascending.
  * Bounded by construction — that is the sketch's whole contract: the
  * stream may carry billions of keys, the state holds k longs. */
case class KmvState(mins: List[Long])

/** Per-trigger sketch emission. `n_kept < k` means the estimate is the
  * exact count so far. */
case class KmvOut(grp: String, n_kept: Int, kth_hash: Long,
                  kmv_estimate: Double)

/** Hashed cell row for the streaming count–min sketch. */
case class CmsIn(d: Int, b: Long)

/** Bucketed ρ row for the streaming HyperLogLog sketch. */
case class HllIn(grp: String, bucket: Long, rho: Long)

/** One HLL register. */
case class HllRegState(register: Long)

/** Per-trigger register emission (update mode). */
case class HllOut(grp: String, bucket: Long, register: Long)

/** Keyed sample row for the streaming KMV quantile sketch. */
case class KqIn(grp: String, h: Long, id: Long, v: Double)

/** Quantile-sketch state: the k (hash, id, value) triples with the
  * smallest (hash, id) — a uniform-without-replacement sample whose
  * membership is arrival-order- and duplication-insensitive, so the
  * streamed sample is bit-identical to the batch sketch's. */
case class KqState(mins: List[(Long, Long, Double)])

/** Per-trigger quantile emission (update mode). */
case class KqOut(grp: String, n_sampled: Int, p50_est: Double,
                 p90_est: Double, p99_est: Double)

/** One CMS counter cell. */
case class CmsCellState(c: Long)

/** Per-trigger cell emission (update mode). */
case class CmsOut(d: Int, b: Long, c: Long)

/** Streaming distinct-count sketching — the unbounded-stream twin of
  * [[graft.operators.Sketches.kmvDistinct]].
  *
  * The batch operator can afford an exact validation column; a stream
  * cannot hold the distinct set, which is exactly the regime sketches
  * exist for. State per group is the k-minimum distinct hash values
  * (`mapGroupsWithState`, no timeout — a distinct-count sketch is
  * monotone and never expires). Because the k-min set of a multiset is
  * independent of arrival order and duplication, the streamed sketch is
  * BIT-IDENTICAL to the batch sketch over the same rows — asserted in
  * StreamingSpec, including out-of-order and duplicated delivery.
  */
object SketchStream {

  /** Pure k-min-set absorption step — the whole sketch algebra in one
    * function, factored out so its invariants (order/duplication
    * insensitivity, idempotence, boundedness) are property-testable
    * without a streaming harness. */
  def absorb(prev: List[Long], hashes: Iterable[Long], k: Int): List[Long] =
    (prev ++ hashes).distinct.sorted.take(k)

  /** `events` must stream rows with `grpCol` and `keyCol`; emits the
    * updated sketch per group per trigger (update output mode). */
  def kmvDistinctStream(events: DataFrame, grpCol: String, keyCol: String,
                        k: Int): Dataset[KmvOut] = {
    import events.sparkSession.implicits._
    require(k >= 2, s"KMV needs k >= 2, got $k")
    events
      .select(col(grpCol).as("grp"), Sketches.hash60(col(keyCol)).as("h"))
      .as[KmvIn]
      .groupByKey(_.grp)
      .mapGroupsWithState[KmvState, KmvOut](GroupStateTimeout.NoTimeout) {
        (grp, rows, state) =>
          val prev = state.getOption.map(_.mins).getOrElse(Nil)
          val mins = absorb(prev, rows.map(_.h).toList, k)
          state.update(KmvState(mins))
          val est =
            if (mins.size < k) mins.size.toDouble
            else Math.scalb((k - 1).toDouble, 60) / mins.last.toDouble
          KmvOut(grp, mins.size, if (mins.isEmpty) -1L else mins.last, est)
      }
  }

  /** Streaming KMV quantile sketch — the unbounded-stream twin of
    * [[graft.operators.Sketches.kmvQuantileSketch]]'s estimate side
    * (the exact validation columns are the batch luxury a stream
    * cannot hold), completing the sketch streaming matrix
    * (distinct / CMS / HLL / QUANTILE). State per group is the k
    * (hash, id, value) triples with the smallest (hash, id) — a
    * k-min-hash uniform sample, so membership is independent of
    * arrival order and re-delivery and the streamed sample (hence
    * every percentile read off it) is BIT-IDENTICAL to the batch
    * sketch's over the same rows. The percentile pick replays
    * `percentile_disc` exactly: smallest value whose cumulative rank
    * reaches p. */
  def kmvQuantileStream(rows: DataFrame, grpCol: String, idCol: String,
                        valueCol: String, k: Int): Dataset[KqOut] = {
    import rows.sparkSession.implicits._
    require(k >= 2, s"need k >= 2, got $k")
    rows
      .select(col(grpCol).as("grp"),
        Sketches.hash60(concat(lit("qs:"), col(idCol).cast("string")))
          .as("h"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[KqIn]
      .groupByKey(_.grp)
      .mapGroupsWithState[KqState, KqOut](GroupStateTimeout.NoTimeout) {
        (grp, it, state) =>
          val prev = state.getOption.map(_.mins).getOrElse(Nil)
          // full-triple sort key: if an id is ever re-delivered with a
          // DIFFERENT value, two triples tie on (hash, id) and take(k)
          // boundary membership would depend on arrival order — the
          // value tie-break keeps state a pure function of the
          // delivered set, the documented bit-identical guarantee
          val mins = (prev ++ it.map(r => (r.h, r.id, r.v)))
            .distinct.sortBy(t => (t._1, t._2, t._3)).take(k)
          state.update(KqState(mins))
          val vs = mins.map(_._3).sorted
          def disc(p: Double): Double =
            vs(math.max(0, math.ceil(p * vs.size).toInt - 1))
          KqOut(grp, mins.size, disc(0.5), disc(0.9), disc(0.99))
      }
  }

  /** Streaming count–min sketch — the unbounded-stream twin of
    * [[graft.operators.Sketches.cmsTable]]: state is one counter per
    * touched (depth-row, bucket) cell, bounded by depth·width
    * regardless of stream cardinality (the CMS contract). Counters are
    * pure sums, so the streamed table is BIT-IDENTICAL to the batch
    * table over the same rows under any arrival order or batching —
    * and cell-wise ADDITIVE across independent streams, the same merge
    * law the batch spec pins. Point estimates read off the emitted
    * table exactly as in [[Sketches.heavyHitters]]. */
  def cmsStream(rows: DataFrame, keyCol: String, depth: Int,
                width: Int): Dataset[CmsOut] = {
    import rows.sparkSession.implicits._
    require(depth >= 1 && width >= 2, s"bad cms shape $depth x $width")
    rows
      .select(col(keyCol).cast("string").as("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d").cast("int").as("d"),
        (Sketches.hash60(concat(col("d").cast("string"), lit(":"),
          col("k"))) % width).as("b"))
      .as[CmsIn]
      .groupByKey(r => (r.d, r.b))
      .mapGroupsWithState[CmsCellState, CmsOut](GroupStateTimeout.NoTimeout) {
        case ((d, b), cellRows, state) =>
          val c = state.getOption.map(_.c).getOrElse(0L) + cellRows.size
          state.update(CmsCellState(c))
          CmsOut(d, b, c)
      }
  }

  /** Streaming HyperLogLog — the unbounded-stream twin of
    * [[graft.operators.Sketches.hllRegisters]]: state is ONE long per
    * touched (group, bucket) register, bounded by groups·2^p
    * regardless of stream cardinality. The register update is max —
    * idempotent, commutative, associative — so the streamed table is
    * BIT-IDENTICAL to the batch table over the same rows under any
    * arrival order, batching, or duplicated delivery, and max-mergeable
    * across independent streams exactly like the batch merge proof
    * ([[graft.operators.Sketches.hllMerged]]). The ρ computation is the
    * same deterministic bin-length projection the batch side plans. */
  def hllStream(rows: DataFrame, grpCol: String, keyCol: String,
                p: Int = 8): Dataset[HllOut] = {
    import rows.sparkSession.implicits._
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val lowBits = 60 - p
    val mask = (1L << lowBits) - 1
    rows
      .select(col(grpCol).as("grp"), Sketches.hash60(col(keyCol)).as("h"))
      .select(col("grp"), shiftright(col("h"), lowBits).as("bucket"),
        col("h").bitwiseAND(lit(mask)).as("rest"))
      .select(col("grp"), col("bucket"),
        when(col("rest") === 0, lit(lowBits + 1))
          .otherwise(lit(lowBits + 1) - length(bin(col("rest"))))
          .cast("long").as("rho"))
      .as[HllIn]
      .groupByKey(r => (r.grp, r.bucket))
      .mapGroupsWithState[HllRegState, HllOut](GroupStateTimeout.NoTimeout) {
        case ((grp, bucket), regRows, state) =>
          val reg = math.max(state.getOption.map(_.register).getOrElse(0L),
            regRows.map(_.rho).max)
          state.update(HllRegState(reg))
          HllOut(grp, bucket, reg)
      }
  }
}
