package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Streaming media-ingestion dedup (north-star extension; the batch
  * tiers live in [[graft.operators.Multimodal]]) — the media twin of
  * [[DocStream.fuzzyIngestStream]], completing the modality matrix:
  * every arriving media payload is checked against the accumulated
  * lake's perceptual-hash index at line rate.
  *
  * Shape discipline: the perceptual hash is computed in the SAME
  * narrow per-partition codec pass as batch decode (a stateless typed
  * map — the one place a codec belongs), the pigeonhole band explode
  * is a stateless projection, the corpus probe is a stream-static
  * equi-join on (kind, band, band_val), and the per-media match set is
  * the single watermark-bounded stateful aggregation (collect_set;
  * state bounded by a payload's Hamming-≤ d neighborhood), emitted
  * once final in append mode.
  */
object MediaStream {

  final case class MediaIn(media_id: Long, ts: java.sql.Timestamp,
                           kind: String, payload: Array[Byte])

  /** [[Multimodal.fromDocuments]] twin for a streaming doc relation —
    * keeps the event-time column. */
  def mediaFromDocStream(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"), col("ts"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Streaming media dedup probe: arriving media whose perceptual hash
    * sits within Hamming ≤ `maxDistance` of ANY corpus media of the
    * same kind. The corpus band index PERSISTS (the [[VecStream]]
    * rule — in the lake story it is the offline artifact bucketed by
    * (kind, band, band_val), the [[graft.operators.Dedup.saveCorpusDigests]]
    * shape); recall is exact by the pigeonhole argument. Lifecycle is
    * CALLER-OWNED ([[DocStream.fuzzyIngestStream]]'s rule): re-building
    * the stream against a new corpus snapshot should unpersist the
    * superseded index when the old stream stops.
    *
    * Output: (media_id, ts, kind, n_matches, nearest_id) for MATCHED
    * media only — the drop/review feed; media absent from the output
    * are fresh (the batch operator's survivor verdict). */
  def mediaIngestStream(spark: SparkSession, media: DataFrame,
                        corpus: DataFrame, maxDistance: Int = 4,
                        watermark: String = "1 hour"): DataFrame = {
    import spark.implicits._
    val corpusBands = Multimodal.bandedPhash(
        Multimodal.mediaFingerprints(spark, corpus), maxDistance)
      .select(col("kind").as("c_kind"), col("band").as("c_band"),
        col("band_val").as("c_band_val"), col("phash").as("c_phash"),
        col("media_id").as("c_id"))
      .persist()
    val hashed = media
      .select("media_id", "ts", "kind", "payload").as[MediaIn]
      .mapPartitions { rows =>
        // the codec pass: same batching point as decodeAndFeaturize —
        // a real implementation opens the decoder once per partition
        rows.map(m => (m.media_id, m.ts, m.kind,
          Multimodal.StubCodec.blockHash(m.payload, Multimodal.PhashBits)))
      }
      .toDF("media_id", "ts", "kind", "phash")
      .withWatermark("ts", watermark)
    val bands = hashed
      .select(col("media_id"), col("ts"), col("kind"), col("phash"),
        posexplode(Multimodal.phashBandVals(maxDistance)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    bands
      .join(corpusBands,
        col("kind") === col("c_kind") && col("band") === col("c_band") &&
          col("band_val") === col("c_band_val"))
      .filter(bit_count(col("phash").bitwiseXOR(col("c_phash")))
        <= maxDistance)
      .groupBy(col("media_id"), col("ts"), col("kind"))
      .agg(collect_set(col("c_id")).as("ms"))
      .select(col("media_id"), col("ts"), col("kind"),
        size(col("ms")).cast("long").as("n_matches"),
        array_min(col("ms")).as("nearest_id"))
  }
}
