package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-prefiltered semi-join — the shuffle-reduction join pattern for
  * the "huge fact, selective dim" shape (the reference has no joins at
  * all; this is north-star lake plumbing a 100 TB pipeline needs).
  *
  * Shape: (1) one mergeable aggregation over the dim keys builds a
  * [[BloomFilterAggregate]] sketch (partial-agg combines per partition,
  * the driver sees one MB-scale binary — same lifecycle as a broadcast
  * dim); (2) the fact side filters on the codegen'd
  * [[BloomFilterMightContain]] predicate AT THE SCAN, so rows that
  * cannot match never reach the exchange; (3) an exact `LEFT SEMI` join
  * against the dim keys removes the bloom's false positives — the
  * output is bit-identical to a plain semi-join (the oracle proves it),
  * the bloom only moves work off the shuffle.
  *
  * Why explicit rather than Spark's `runtime.bloomFilter` injection:
  * the injected filter is cost-gated (creation-side size thresholds,
  * shuffle-presence heuristics) and can silently decline; a pipeline
  * that RELIES on the reduction — e.g. a 100 TB fact semi-joined to a
  * 10 M-key dim where the unpruned shuffle is the whole job cost —
  * wants the sketch deterministically present and sized by the caller.
  * Both expressions are Spark's own (the exact machinery the injected
  * path uses), so the probe stays inside whole-stage codegen.
  *
  * Sizing: `numBits = ceil(-n·ln(fpp)/ln(2)²)` (the standard optimum).
  * At n=10⁷ keys and fpp=3%, ~9 MB — task-binary scale. False positives
  * only cost shuffled-then-dropped rows, never correctness.
  *
  * Regime (measured, BLOOM_PROBE_r14.json): the prefilter pays when the
  * semi-join SHUFFLES (big dim) — 16.2× fact-row reduction, 0 fps,
  * 1.63× wall already at 600 k rows with broadcast disabled. Under a
  * broadcastable dim it is a wash (every row pays a hash probe either
  * way) — there the value is the deterministic plan shape, not speed.
  */
object BloomJoin {

  /** Aggregate Column building a bloom filter binary over `key`. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Bridge.expression(lit(expectedItems)),
      Bridge.expression(lit(numBits))).toAggregateExpression())

  /** Codegen'd `might_contain` predicate over a built filter. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloom)),
      Bridge.expression(xxhash64(key))))

  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** Build the dim-key bloom filter (one aggregation job).
    *
    * Spark silently CAPS the sketch at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 64 Mbit ≈ 8 MB) — above ~9 M expected items at fpp=3% the
    * requested size exceeds the cap and the realized fpp degrades
    * without any error. Correctness never suffers (the exact LEFT
    * SEMI absorbs every false positive), but a caller sizing for a
    * 100 TB-regime reduction must actually GET the bits it asked
    * for, so when the optimum exceeds the session cap we raise the
    * conf to fit for THIS aggregation only and restore it in a
    * finally (r16, the r15 verdict #3): the raised cap must not leak
    * into Spark's own runtime bloom-filter injection on every later
    * query in the session — the admin sized that cap for broadcast /
    * driver-memory reasons this one explicit build doesn't get to
    * repeal. */
  def buildBloom(dim: DataFrame, dimKey: String, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val confKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val spark = dim.sparkSession
    val prior = spark.conf.getOption(confKey)
    val cap = prior.map(_.toLong).getOrElse(67108864L)
    val raised = numBits > cap
    if (raised) spark.conf.set(confKey, numBits.toString)
    try
      dim.select(bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))
        .head.getAs[Array[Byte]](0)
    finally if (raised) prior match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** Exact semi-join of `fact` to `dim` keys with the bloom prefilter
    * on the fact scan. Output ≡ `fact WHERE factKey IN (SELECT dimKey
    * FROM dim)`; only bloom-surviving rows shuffle (or hit the
    * broadcast probe), which at a selective dim is the whole cost win.
    * The dim key is aliased to a private name before the join so the
    * common same-name case (fact.partkey semi dim.partkey) doesn't
    * trip an ambiguous-reference AnalysisException. */
  def semiJoinBloom(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, fpp)
    val dk = "__graft_bloom_dk"
    fact.where(mightContain(bloom, col(factKey)))
      .join(dim.select(col(dimKey).as(dk)).distinct(),
        col(factKey) === col(dk), "left_semi")
  }
}
