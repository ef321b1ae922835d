package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over the `documents` table (north-star
  * training-data-pipeline extension; the reference has no dedup —
  * SURVEY.md §2.5).
  *
  * Four tiers, cheap→thorough, all shuffle-frugal:
  *   1. exact        — one hash-groupBy on a content digest.
  *   2. bag-of-words — same groupBy on an order-insensitive digest.
  *   3. n-gram Jaccard — token-postings self-join inside a blocking key
  *                       (never all-pairs across the corpus).
  *   4. MinHash+LSH / SimHash — signature sketches whose band/fingerprint
  *                       buckets bound candidate pairs at 100 TB scale.
  */
object Dedup {

  private def contentHash: Column = md5(col("text").cast("binary"))

  /** Exact-duplicate groups: digest → survivor (min doc_id) + group size.
    * A single hash aggregation; at scale the digest groupBy is the only
    * shuffle and partial aggregation collapses uniques map-side. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(contentHash.as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("group_size"))

  /** Documents surviving exact dedup (first doc_id per content wins). */
  def exactKept(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(contentHash).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Distinct tokens per document — the postings list every near-dup
    * tier builds on. */
  def tokenPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("token"))

  /** Token-set Jaccard pairs ≥ threshold, blocked by `lang` so the
    * self-join stays partition-local after one shuffle on (lang, token).
    * Threshold compare kept integral (inter·10 ≥ t·10·union) so the
    * oracle agrees bit-for-bit. */
  def jaccardPairs(docs: DataFrame, thresholdTenths: Int): DataFrame = {
    val tok = tokenPostings(docs)
    val counts = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tok.as("t1")
      .join(tok.as("t2"),
        col("t1.token") === col("t2.token") && col("t1.lang") === col("t2.lang") &&
          col("t1.doc_id") < col("t2.doc_id"))
      .groupBy(col("t1.doc_id").as("d1"), col("t2.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(counts.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * thresholdTenths)
      .select(col("d1"), col("d2"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** MinHash signatures: K independent hash functions simulated as
    * xxhash64(k, token); signature element k = min over the doc's tokens.
    * One explode + one groupBy — the sketch costs O(tokens·1) with K
    * aggregates, not K passes. */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame =
    tokenPostings(docs)
      .groupBy("doc_id")
      .agg(array((0 until numHashes).map(k =>
        min(xxhash64(lit(k), col("token")))): _*).as("sig"))

  /** MinHash-LSH candidate pairs: signatures cut into `bands` bands of
    * r = K/bands rows; docs sharing any band hash become candidates;
    * estimated Jaccard = matching signature fraction. The band groupBy
    * is the LSH trick that keeps candidate generation linear-ish at
    * scale (only same-bucket docs ever meet). */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 32,
                      bands: Int = 8): DataFrame = {
    val r = numHashes / bands
    val sigs = minhashSignatures(docs, numHashes)
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          hash(slice(col("sig"), b * r + 1, r))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .dropDuplicates("d1", "d2")
    cand.select(col("d1"), col("d2"),
      (aggregate(zip_with(col("sig1"), col("sig2"),
        (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / numHashes)
        .as("est_jaccard"))
  }

  /** 64-bit SimHash fingerprints: each token occurrence votes ±1 on each
    * bit of its xxhash64; fingerprint bit = sign of the tally. Computed
    * as 64 conditional-sum aggregates over one explode — single shuffle. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"bit$b")
    }
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"bit$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDistance, blocked
    * by `lang`. At 100 TB the blocking key would be simhash bit-bands
    * (pigeonhole: some band of a ≤k-distant pair matches exactly). */
  def simhashPairs(docs: DataFrame, maxDistance: Int): DataFrame = {
    val fp = simhashFingerprints(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    fp.as("a").join(fp.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }
}
