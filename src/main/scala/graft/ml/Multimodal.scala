package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video treated as opaque `binary`
 * payloads with typed metadata, plus partition-batched feature extraction
 * (extended LLM-pipeline surface; absent from the reference — its binary
 * handling stops at hex-encoding, reference: binlog2sql_util.py:184-191).
 *
 * The DECODE step is a STUB by design: the real image/audio codecs are not in
 * this container, so `extractFeatures` computes a deterministic fake feature
 * (a byte histogram folded to `dim` buckets) — but the Spark-side plumbing it
 * exercises is the real thing: typed Dataset, per-partition batch iteration
 * (the `mapPartitions` shape a JNI/codec call would need so the codec is
 * initialized once per partition, not per row), fixed-width Float features,
 * and metadata carried alongside the payload.
 */
object Multimodal {

  /** One media row: an opaque payload plus its provenance id. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features: payload size + fixed-width feature vector. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, feature: Array[Float])

  /** Attach a binary payload column (here: the UTF-8 bytes of `textCol` —
    * the stand-in for real media bytes) with typed metadata columns. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("payload_md5", md5(col("payload")))
      .withColumn("header_hex", substring(hex(col("payload")), 1, 8))

  /** Byte-stride sampling — the "frame sample" shape: every `stride`-th byte
    * of the payload as a new binary column (pure column expression). */
  def sampleBytes(df: DataFrame, payloadCol: String, stride: Int): DataFrame =
    df.withColumn("sampled", expr(
      s"""aggregate(
         |  transform(sequence(1, int(ceil(length($payloadCol) / ${stride}D))),
         |            i -> substring($payloadCol, (i - 1) * $stride + 1, 1)),
         |  cast(X'' as binary), (acc, x) -> concat(acc, x))""".stripMargin))

  /** Nearest-neighbor "resize" — the image-resize plumbing shape: a
    * variable-length payload mapped to EXACTLY `targetLen` bytes, byte i of
    * the output sampled at floor(i·len/targetLen) of the input (the same
    * index arithmetic NN image scaling uses, in one dimension). Empty
    * payloads resize to empty. Pure column expression — a real pixel-aware
    * resize would replace only the sampling kernel. The i·len product is
    * computed in 64-bit: at the multi-megabyte payloads this op exists for,
    * i·len exceeds Int.MaxValue long before the final index does. */
  def resizeBytes(df: DataFrame, payloadCol: String, targetLen: Int): DataFrame = {
    require(targetLen > 0, s"target length must be positive: $targetLen")
    df.withColumn("resized", expr(
      s"""CASE WHEN length($payloadCol) = 0 THEN $payloadCol ELSE
         |aggregate(
         |  transform(sequence(0, ${targetLen - 1}),
         |    i -> substring($payloadCol,
         |           int((bigint(i) * length($payloadCol)) div $targetLen) + 1, 1)),
         |  cast(X'' as binary), (acc, x) -> concat(acc, x)) END""".stripMargin))
  }

  /** Fixed-width frame sampling — the video shape: the payload is a
    * sequence of `frameSize`-byte frames; keep every `stride`-th frame,
    * starting at frame 0 (a trailing partial frame is kept as-is). */
  def sampleFrames(df: DataFrame, payloadCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0, s"frameSize=$frameSize stride=$stride")
    df.withColumn("frames", expr(
      s"""aggregate(
         |  transform(
         |    sequence(0, greatest(int(ceil(length($payloadCol) / ${frameSize}D)) - 1, 0)),
         |    f -> CASE WHEN f % $stride = 0
         |           THEN substring($payloadCol, f * $frameSize + 1, $frameSize)
         |           ELSE cast(X'' as binary) END),
         |  cast(X'' as binary), (acc, x) -> concat(acc, x))""".stripMargin))
  }

  /** STUB decode + featurize: fold the payload bytes into a `dim`-bucket
    * histogram normalized by length. Deterministic, so tests can pin it; a
    * real decoder would replace only the body of the per-row lambda. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, ...)
      rows.map { r =>
        val hist = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          hist(((r.payload(i) & 0xff) * dim) / 256) += 1f
          i += 1
        }
        val n = math.max(r.payload.length, 1)
        var j = 0
        while (j < dim) { hist(j) /= n.toFloat; j += 1 }
        MediaFeatures(r.doc_id, r.payload.length, hist)
      }
    }
  }
}
