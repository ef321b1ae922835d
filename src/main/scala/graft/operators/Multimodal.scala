package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north-star
  * extension: media travels as an opaque `binary` payload column with
  * typed metadata, and decode/feature-extraction runs as batched
  * per-partition transformations.
  *
  * The heavy codecs (JPEG/PNG decode, audio resample, video frame
  * extraction) are NOT in this container, so the codec calls are STUBBED
  * behind [[StubCodec]] with a deterministic fake; everything Spark owns
  * — schema, partitioning, batch shape, the Dataset API surface — is
  * real and tested. Swapping [[StubCodec]] for a JNI/javacpp-backed
  * implementation changes no plumbing.
  *
  * Scale: payloads never pass through a shuffle (decode is a narrow
  * mapPartitions right after the scan; only extracted fixed-size
  * features — a few KB/row — flow into joins/aggregations). Batched
  * iteration amortizes per-call codec setup exactly like Arrow batches
  * amortize Python UDF overhead in PySpark's `mapInPandas`.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            source: String)
  final case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                                checksum: Long, width: Int, height: Int,
                                features: Array[Float])

  /** Deterministic stand-in for the real codecs. Replace with real
    * decoders (e.g. javacpp-presets ffmpeg/opencv) in production — the
    * call sites and schemas stay identical. */
  object StubCodec {
    /** FNV-1a 64-bit over the payload — stands in for a decode+digest
      * (delegates to the engine's canonical implementation). */
    def checksum(bytes: Array[Byte]): Long = graft.functions.Fnv64.hash(bytes)

    /** Fake dimension probe: derived from payload length — a real codec
      * reads the container header here. */
    def probeDims(kind: String, bytes: Array[Byte]): (Int, Int) = kind match {
      case "image" => (bytes.length % 640 + 1, bytes.length % 480 + 1)
      case "video" => (1280, 720)
      case _       => (0, 0) // audio: no spatial dims
    }

    /** Fake feature extractor: fixed-dim float vector from a rolling
      * hash over byte windows — a real impl runs the vision/audio model
      * forward pass here, batched. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1469598103934665603L
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i) & 0xffL; h *= 1099511628211L
        out(math.abs((h % dim).toInt)) += 1f
        i += 1
      }
      val n = math.sqrt(out.map(x => x.toDouble * x).sum).toFloat max 1f
      out.map(_ / n)
    }
  }

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for real image/audio blobs), kind
    * round-robined over the three modalities. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** Batched decode + feature extraction: one [[StubCodec]] "session"
    * per partition, rows processed in batches of `batchSize` (the
    * mapInPandas batch-shape discipline). */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame,
                         dim: Int = 16, batchSize: Int = 64): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "kind", "payload", "source").as[MediaRow]
      .mapPartitions { rows =>
        // Real impl: open the codec/model ONCE here (the per-partition
        // setup is the amortization point), then feed it `batchSize`
        // payloads per call — `rows.grouped(batchSize)` is the batch
        // boundary a model forward-pass would consume. The stub codec
        // is per-row, so batches are passed through without reshaping.
        rows.grouped(batchSize).flatMap { batch =>
          // stub stands where `codec.decodeBatch(batch.map(_.payload))` goes
          batch.iterator.map { m =>
            val (w, h) = StubCodec.probeDims(m.kind, m.payload)
            DecodedMedia(m.media_id, m.kind, m.payload.length.toLong,
              StubCodec.checksum(m.payload), w, h,
              StubCodec.features(m.payload, dim))
          }
        }
      }
  }

  /** Resize plumbing: deterministic stride-downsample of the payload to
    * ≤ `targetBytes` with the claimed output dims in metadata — where a
    * real image resize (decode → scale → re-encode) slots in. Pure
    * column expressions: the byte stride mirrors pixel-stride
    * downsampling without a codec. */
  def resizeStub(media: DataFrame, targetBytes: Int,
                 targetW: Int, targetH: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val n = length(col("payload"))
    val stride = greatest(lit(1), ceil(n.cast("double") / targetBytes).cast("int"))
    media
      .filter(n > 0)
      .select(col("media_id"), col("kind"),
        // three-arg sequence yields the strided indices directly —
        // building a full 1..n array per row and filtering it would
        // allocate O(payload) per row. Slices stay binary end-to-end:
        // substr on binary returns binary, and binary concat keeps raw
        // bytes (a string round-trip would mangle non-UTF-8 payloads).
        aggregate(
          transform(sequence(lit(1), n, stride),
            i => col("payload").substr(i, lit(1))),
          lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x)).as("resized"),
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("payload").as("original"))
      .withColumn("resized_bytes", length(col("resized")).cast("long"))
  }

  /** Frame sampling plumbing: slice the payload into fixed-size chunks
    * ("frames"), keep every `everyN`-th — pure column expressions, no
    * UDF; the chunking pattern a real video pipeline applies before
    * shipping frames to decode. */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      // empty payload has zero frames; without the guard sequence(0,-1)
      // would DESCEND to [0,-1] and emit a phantom frame
      .filter(length(col("payload")) > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("media_id"), col("kind"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }
}
