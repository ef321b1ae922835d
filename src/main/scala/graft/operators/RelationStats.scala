package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-lifetime memo of auto-sizing relation counts.
  *
  * Several operators pick a physical strategy from a data-dependent
  * scalar — tf·idf's shard count ([[TextOps.autoBuildShards]]), the
  * LSH quotient short-circuit ([[Dedup.minhashLshPairs]]) — and that
  * sizing action used to re-run on EVERY invocation: a bench loop
  * paid a fresh count job per repetition for a number that cannot
  * change within the session (sources are driver-generated immutable
  * parquet; bench/verify re-run the same queries against the same
  * dirs — the contract that makes a session-lifetime memo sound).
  *
  * Keyed by (session, canonicalized analyzed plan): structural plan
  * equality, not a hash shortcut, so two relations memo-share exactly
  * when Catalyst says they are the same computation. The map holds a
  * handful of scalar entries per session — never result data. */
object RelationStats {
  private val memo =
    new ConcurrentHashMap[(SparkSession, LogicalPlan), java.lang.Long]()

  /** `df.count()`, computed once per (session, canonical plan). */
  def memoCount(df: DataFrame): Long =
    memo.computeIfAbsent(
      (df.sparkSession, df.queryExecution.analyzed.canonicalized),
      _ => df.count())

  /** First row's first column as a long (a one-row sizing aggregate —
    * guard nullable aggregates with `coalesce(..., 0)` at the call
    * site), computed once per (session, canonical plan). */
  def memoScalar(df: DataFrame): Long =
    memo.computeIfAbsent(
      (df.sparkSession, df.queryExecution.analyzed.canonicalized),
      _ => df.first().getLong(0))

  private val scalarTagged = new ConcurrentHashMap[
    (SparkSession, LogicalPlan, String), java.lang.Long]()

  /** A scalar memoized under (session, SOURCE plan, tag) with the
    * value computed by an arbitrary action — for sizing scalars whose
    * natural computation runs over a checkpoint-PINNED derived relation
    * (each invocation's checkpoint canonicalizes to a fresh LogicalRDD,
    * so keying on the computation plan — [[memoScalar]] — would never
    * hit across invocations; keying on the stable source plan does).
    * get + putIfAbsent like [[memoRelation]]: tolerates nesting. */
  def memoScalarTagged(source: DataFrame, tag: String)
                      (build: => Long): Long = {
    val key = (source.sparkSession,
      source.queryExecution.analyzed.canonicalized, tag)
    val existing = scalarTagged.get(key)
    if (existing != null) existing.longValue()
    else {
      val built = java.lang.Long.valueOf(build)
      val prior = scalarTagged.putIfAbsent(key, built)
      (if (prior != null) prior else built).longValue()
    }
  }

  private val rel = new ConcurrentHashMap[
    (SparkSession, LogicalPlan, String), DataFrame]()

  /** A deterministic DERIVED RELATION cached per (session, source
    * plan, tag) — the DataFrame-valued sibling of [[memoCount]], for
    * small offline artifacts every query of a family re-derives from
    * the same immutable source (the semantic tier's Lloyd codebook:
    * k·dim longs behind a rounds-deep build). The cached value should
    * be checkpoint-pinned by the builder so all consumers share ONE
    * materialization; correctness is unaffected (the build is
    * deterministic), only the per-query rebuild cost goes away —
    * which is also the production story, where the codebook is a
    * persisted lake artifact, not a per-query computation. */
  def memoRelation(source: DataFrame, tag: String)
                  (build: => DataFrame): DataFrame = {
    val key = (source.sparkSession,
      source.queryExecution.analyzed.canonicalized, tag)
    // NOT computeIfAbsent: memoized builds legitimately nest (the
    // residual-subvector build reads the memoized cell assignment,
    // which reads the memoized Lloyd book), and a reentrant
    // computeIfAbsent on one ConcurrentHashMap throws
    // "Recursive update" whenever the inner insert lands mid-resize.
    // get + putIfAbsent tolerates nesting; the benign race (two
    // threads building the same key) just builds the identical
    // deterministic lazy plan twice and keeps the first.
    val existing = rel.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prior = rel.putIfAbsent(key, built)
      if (prior != null) prior else built
    }
  }

  /** Test hook: forget everything (a fresh session in the same JVM
    * re-counts; distinct sessions never collide — the session is part
    * of the key). */
  private[graft] def reset(): Unit = {
    memo.clear(); rel.clear(); scalarTagged.clear()
  }

  /** A lazy local checkpoint stored at EXECUTOR WIDTH — for pinned
    * artifacts whose consumers are broadcast-join chains (no exchange
    * between the pin and the heavy work). AQE rightly coalesces a
    * small shuffle output to few partitions, and a plain
    * `localCheckpoint` then FREEZES that layout: every downstream
    * pass inherits it, and the PQ family's training/encode passes fan
    * each pinned row out ×codewords with no re-exchange — a coalesced
    * pin serializes ~100× more work than the relation itself.
    * Measured (RPQ_COST_PROBE_r11.json, sf0.1 ×10): `ann_ivf_rpq`
    * 31.0 s against the coalesced pin vs 3.0 s rebuilt at width —
    * the SCALESMOKE_r11 `ann_ivf_rpq*` ratios ~11-13 over factor 10
    * were exactly this. The explicit partition count is exempt from
    * AQE coalescing by contract (REPARTITION_BY_NUM), and hashing on
    * the relation's id key keeps the layout the downstream partial
    * aggregations expect. On a cluster this is the artifact-write
    * rule: persist the index relations with enough splits for their
    * readers, not with the write job's residual layout. */
  def pinnedWide(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        keys: _*)
      .localCheckpoint(eager = false)
}
