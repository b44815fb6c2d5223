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

  /**
   * Perceptual hash of the payload bytes — the multimodal twin of text
   * SimHash, in the dHash (difference-hash) family: sample `samples` bytes
   * at the nearest-neighbor resize positions ([[resizeBytes]]'s index
   * arithmetic, so a payload scaled/padded by a constant factor samples
   * ~the same content), set bit j iff sample j+1 > sample j. A real image
   * dHash runs the identical comparison over a 9×8 downscaled luminance
   * grid; with codecs stubbed out of this container the byte stream stands
   * in for the pixel stream, and ONLY the sampling kernel would change —
   * the signature/banding/verify plumbing is the production shape.
   *
   * 48 bits from 49 samples keeps the signature in a positive BIGINT
   * (bit 47 < sign bit — the same budget as text SimHash) and splits
   * evenly into 4 LSH bands of 12 bits. Byte values decode from the hex
   * payload (CAST(conv(hex,16,10)) — engine-portable unsigned bytes).
   * Payloads SHORTER than `samples` bytes produce no signature row: the
   * NN-resample would revisit the same bytes (a length-1 payload always
   * hashes to 0), so unrelated tiny payloads would verify as hamming-0
   * "near-dups" and pile into one LSH bucket — a quadratic candidate join
   * on short-doc-heavy corpora (ADVICE r8). Pure column expressions: the
   * per-row lambda touches `samples` cells, not payload-length.
   */
  def phash(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", samples: Int = 49): DataFrame = {
    require(samples >= 2 && samples <= 64, s"samples must be in [2, 64]: $samples")
    media
      .filter(length(col(payloadCol)) >= samples)
      .select(col(idCol).as("doc_id"), hex(col(payloadCol)).as("__hx"),
        length(col(payloadCol)).cast("long").as("__n"))
      .select(col("doc_id"), expr(
        s"""aggregate(
           |  transform(sequence(0, ${samples - 2}),
           |    j -> CASE WHEN
           |      CAST(conv(substring(__hx,
           |        CAST((CAST(j + 1 AS BIGINT) * __n) div $samples * 2 + 1 AS INT), 2),
           |        16, 10) AS BIGINT) >
           |      CAST(conv(substring(__hx,
           |        CAST((CAST(j AS BIGINT) * __n) div $samples * 2 + 1 AS INT), 2),
           |        16, 10) AS BIGINT)
           |    THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END),
           |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("phash"))
  }

  /** Near-dup payload pairs by perceptual hash: band the 48-bit signature
    * into 12-bit chunks, equi-join on band values, verify with exact
    * hamming distance — [[graft.text.TextOps.simhashPairs]]'s banding
    * reused verbatim (pigeonhole: hamming <= bands-1 guarantees a shared
    * band), so the candidate join stays an equi-join at any corpus size.
    * Output: (doc_a, doc_b, hamming). */
  def phashPairs(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", maxDist: Int = 3): DataFrame =
    graft.text.TextOps.simhashPairs(
      phash(media, idCol, payloadCol).select(col("doc_id"), col("phash").as("simhash")),
      bits = 48, bandBits = 12, maxDist = maxDist)

  /** Banded phash signatures — the PERSISTABLE form of the signature
    * ([[phashPairs]]'s banding, exposed as rows): one row per (doc, band)
    * carrying the full signature for the hamming verify. This is what
    * [[graft.stream.CorpusIngest]] appends per accepted batch, the
    * multimodal twin of its MinHash `bands` table. Output:
    * (doc_id, phash, band, v). */
  def phashBands(media: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload", samples: Int = 49,
      bits: Int = 48, bandBits: Int = 12): DataFrame = {
    require(bits % bandBits == 0, s"bits=$bits not divisible by bandBits=$bandBits")
    val bands = (0 until bits / bandBits).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("phash"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("v"))
    }
    phash(media, idCol, payloadCol, samples)
      .select(col("doc_id"), col("phash"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("phash"), col("bs.band").as("band"),
        col("bs.v").as("v"))
  }

  /** Probe banded phash signatures against a persisted band index: equi-join
    * on (band, v) — cost follows the PROBE batch's bucket fanout, never the
    * corpus — then exact-hamming verify on the carried signatures. Output:
    * (batch_id, corpus_id, hamming), distinct pairs within `maxDist`. */
  def phashProbeIndexed(indexBands: DataFrame, probeBands: DataFrame,
      maxDist: Int = 3): DataFrame =
    indexBands.alias("x").join(probeBands.alias("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v"))
      .select(col("y.doc_id").as("batch_id"), col("x.doc_id").as("corpus_id"),
        expr("bit_count(x.phash ^ y.phash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)

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
