package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video treated as opaque `binary`
 * payloads with typed metadata, plus partition-batched feature extraction
 * (extended LLM-pipeline surface; absent from the reference — its binary
 * handling stops at hex-encoding, reference: binlog2sql_util.py:184-191).
 *
 * The formats a web corpus actually contains DECODE FOR REAL — pure
 * byte-array/JDK-zip arithmetic, no external codec dependency: 24-bit BMP
 * ([[decodeBmp]]), netpbm P2/P3/P5/P6 ([[decodePnm]]), 8-bit PNG
 * ([[decodePng]] — Inflater + per-row filters + chunk CRCs), GIF
 * ([[decodeGif]] — full LZW + 4-pass deinterlace), baseline JPEG luma
 * ([[decodeJpeg]] — Huffman + dequant + IDCT; GIF and JPEG are
 * cross-checked against the JDK's ImageIO), RIFF/WAVE PCM audio
 * ([[decodeWav]]), and RIFF/AVI video with lazy per-frame DIB decode
 * ([[decodeAvi]]/[[aviFrameLuma]]). They feed pixel-domain perceptual
 * hashing ([[phashDecoded]]) and the oracle-gated reports
 * ([[decodeReport]], [[audioReport]], [[audioEnergyWindows]],
 * [[videoFrameReport]]); every decoder shares one contract — corrupt
 * bytes return None, NEVER crash the batch ([[graft.ml]]'s CodecFuzzSpec
 * soaks it). Formats that genuinely need external codecs (modern video,
 * compressed audio) keep the documented STUB path: `extractFeatures`
 * computes a deterministic fake feature (a byte histogram folded to `dim`
 * buckets) — but the Spark-side plumbing it exercises is the real thing:
 * typed Dataset, per-partition batch iteration (the `mapPartitions` shape
 * a JNI/codec call would need so the codec is initialized once per
 * partition, not per row), fixed-width Float features, and metadata
 * carried alongside the payload.
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

  // ------------------------------------------------------------ BMP codec
  // One REAL dependency-free image format (VERDICT r10 item 5): 24-bit
  // uncompressed BI_RGB Windows BMP — pure byte-array arithmetic (LE
  // headers, 4-byte row padding, bottom-up row order, BGR channel order),
  // so the decode path the multimodal stubs modeled runs for real in this
  // container. Formats needing external codecs still route through
  // [[extractFeatures]]'s documented histogram stand-in.

  /** A decoded image: dimensions plus row-major TOP-DOWN integer
    * luminance in [0, 255] (integer BT.601: (299r + 587g + 114b) / 1000 —
    * exact, engine-replayable arithmetic). */
  final case class DecodedImage(width: Int, height: Int, luma: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Encode one 24-bit BI_RGB BMP: `rgb(x, y)` supplies channels in
    * [0, 255] with `y` the TOP-DOWN row index (the encoder handles the
    * format's bottom-up storage and 4-byte row padding). The fixture
    * generator for the decode gate + specs — and the honest proof the
    * decoder parses the real layout, not a private invention: encode →
    * decode round-trips bit-exactly through the on-disk format. */
  def encodeBmp24(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int),
      topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val imageSize = rowSize * height
    val out = new Array[Byte](54 + imageSize)
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLE32(off: Int, v: Int): Unit = {
      putLE16(off, v & 0xffff); putLE16(off + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    putLE32(2, out.length); putLE32(10, 54)
    putLE32(14, 40); putLE32(18, width)
    putLE32(22, if (topDown) -height else height)
    putLE16(26, 1); putLE16(28, 24); putLE32(30, 0); putLE32(34, imageSize)
    var y = 0
    while (y < height) {
      val row = 54 + (if (topDown) y else height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(row + x * 3) = b.toByte
        out(row + x * 3 + 1) = g.toByte
        out(row + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[encodeBmp24]]'s 32-bit BGRx twin — the padding byte carries a
    * deterministic NON-zero value so a decode that misreads it as a
    * channel breaks loudly. */
  def encodeBmp32(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val rowSize = width * 4
    val out = new Array[Byte](54 + rowSize * height)
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLE32(off: Int, v: Int): Unit = {
      putLE16(off, v & 0xffff); putLE16(off + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    putLE32(2, out.length); putLE32(10, 54)
    putLE32(14, 40); putLE32(18, width); putLE32(22, height)
    putLE16(26, 1); putLE16(28, 32); putLE32(30, 0)
    putLE32(34, rowSize * height)
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(row + x * 4) = b.toByte
        out(row + x * 4 + 1) = g.toByte
        out(row + x * 4 + 2) = r.toByte
        out(row + x * 4 + 3) = ((x * 11 + y * 3) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[encodeBmp24]]'s 8-bit palette twin: the colour table is built from
    * the distinct colours in first-visit order (must fit 256 entries). */
  def encodeBmp8(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val palette = scala.collection.mutable.LinkedHashMap.empty[(Int, Int, Int), Int]
    for (y <- 0 until height; x <- 0 until width) {
      val c = rgb(x, y)
      if (!palette.contains(c)) palette(c) = palette.size
    }
    require(palette.size <= 256, s"palette overflow: ${palette.size} colours")
    val rowSize = ((width + 3) / 4) * 4
    val dataOff = 54 + 4 * palette.size
    val out = new Array[Byte](dataOff + rowSize * height)
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLE32(off: Int, v: Int): Unit = {
      putLE16(off, v & 0xffff); putLE16(off + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    putLE32(2, out.length); putLE32(10, dataOff)
    putLE32(14, 40); putLE32(18, width); putLE32(22, height)
    putLE16(26, 1); putLE16(28, 8); putLE32(30, 0)
    putLE32(34, rowSize * height); putLE32(46, palette.size)
    palette.foreach { case ((r, g, b), i) =>
      out(54 + i * 4) = b.toByte
      out(54 + i * 4 + 1) = g.toByte
      out(54 + i * 4 + 2) = r.toByte
    }
    var y = 0
    while (y < height) {
      val row = dataOff + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        out(row + x) = palette(rgb(x, y)).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an uncompressed (BI_RGB) BMP payload — 24-bit BGR, 32-bit
    * BGRx (the padding byte ignored), or 8-bit palette (colour table =
    * `biClrUsed` BGRx entries after the info header, 0 meaning 256;
    * out-of-range pixel indices refuse) — to top-down row-major
    * luminance; `None` for anything else (wrong magic, bit depth,
    * compression, or a truncated pixel array or colour table) — the
    * typed-column contract: unsupported payloads are skipped, never
    * crash the batch. Handles both bottom-up (positive height — the
    * common form) and top-down (negative height) row orders. */
  def decodeBmp(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M')
      return None
    val off = le32(payload, 10)
    val width = le32(payload, 18)
    val rawH = le32(payload, 22)
    // abs(Int.MinValue) is still negative — a hostile 0x80000000 height
    // would slip the == 0 guard and poison the size arithmetic below, so
    // require strictly positive (mirrors the hostile-width handling)
    val height = math.abs(rawH)
    val bottomUp = rawH > 0
    val hdrSize = le32(payload, 14)
    val bpp = le16(payload, 28)
    if (hdrSize < 40 || width <= 0 || height <= 0 ||
        (bpp != 24 && bpp != 32 && bpp != 8) || le32(payload, 30) != 0)
      return None
    // 8-bit: read the colour table (BGRx entries right after the info
    // header) to per-entry luma before touching pixel data
    var plte: Array[Int] = null
    if (bpp == 8) {
      val used = le32(payload, 46)
      val count = if (used == 0) 256 else used
      val tblOff = 14L + hdrSize
      if (count < 1 || count > 256 || hdrSize > payload.length ||
          tblOff + 4L * count > off || tblOff + 4L * count > payload.length)
        return None
      val tb = tblOff.toInt
      plte = Array.tabulate(count) { i =>
        (299 * (payload(tb + i * 4 + 2) & 0xff) +
          587 * (payload(tb + i * 4 + 1) & 0xff) +
          114 * (payload(tb + i * 4) & 0xff)) / 1000
      }
    }
    // size arithmetic in LONG: a hostile header (width near 2^31) would
    // overflow the Int rowSize/pixel-count products into negatives and
    // crash the batch (NegativeArraySizeException) instead of skipping —
    // the one thing a corrupt payload must never do. Once the bound check
    // passes, every product is <= payload.length and fits an Int.
    val rowSizeL = ((width.toLong * bpp / 8 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowSizeL * height > payload.length)
      return None
    val rowSize = rowSizeL.toInt
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val src = off + (if (bottomUp) height - 1 - y else y) * rowSize
      var x = 0
      while (x < width) {
        luma(y * width + x) = bpp match {
          case 8 =>
            val idx = payload(src + x) & 0xff
            if (idx >= plte.length) return None
            plte(idx)
          case _ =>
            val s = src + x * (bpp / 8)
            val b = payload(s) & 0xff
            val g = payload(s + 1) & 0xff
            val r = payload(s + 2) & 0xff
            (299 * r + 587 * g + 114 * b) / 1000
        }
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, luma))
  }

  /** Scan `n` whitespace-separated decimal tokens from `b` starting at
    * `start`, honoring `#`-to-EOL comments (the netpbm header grammar).
    * Returns (tokens, position after the last digit); None on anything
    * malformed — a non-digit token, EOF mid-header, or a value that
    * overflows Int. */
  private def pnmTokens(b: Array[Byte], start: Int,
      n: Int): Option[(Array[Int], Int)] = {
    val out = new Array[Int](n)
    var pos = start
    var got = 0
    while (got < n) {
      var skipping = true
      while (skipping) {
        if (pos >= b.length) return None
        val c = b(pos)
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else skipping = false
      }
      var v = 0L
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0')
        if (v > Int.MaxValue) return None
        pos += 1
        any = true
      }
      if (!any) return None
      out(got) = v.toInt
      got += 1
    }
    Some((out, pos))
  }

  /** Decode a netpbm payload — the FULL classic family: P1/P4 bitmaps
    * (no maxval; 1 = BLACK → luma 0, 0 = white → 255; P1 digits may pack
    * without separators per the spec, P4 rows are MSB-first bit-packed
    * and byte-padded), P2/P3 ASCII and P5/P6 raw gray/color (maxval must
    * be 255 — 16-bit netpbm is refused, never misread) — to top-down
    * row-major luminance: gray directly for PGM, integer BT.601
    * ([[decodeBmp]]'s exact arithmetic) for PPM. `None` for P7 PAM,
    * truncated sample data, samples above maxval, or hostile header
    * dimensions — the same never-crash-the-batch contract as
    * [[decodeBmp]], size arithmetic in Long throughout. */
  def decodePnm(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload.length < 2 || payload(0) != 'P') return None
    val kind = payload(1).toChar
    if (kind < '1' || kind > '6') return None
    val bitmap = kind == '1' || kind == '4' // PBM: no maxval, 1 = BLACK
    val raw = kind == '4' || kind == '5' || kind == '6'
    val channels = if (kind == '3' || kind == '6') 3 else 1
    val hdr = pnmTokens(payload, 2, if (bitmap) 2 else 3) match {
      case Some(h) => h
      case None => return None
    }
    val (width, height) = (hdr._1(0), hdr._1(1))
    val maxval = if (bitmap) 1 else hdr._1(2)
    if (width <= 0 || height <= 0 || (!bitmap && maxval != 255)) return None
    val nPxL = width.toLong * height
    // reject oversized images BEFORE any further size arithmetic: with
    // nPxL bounded by Int.MaxValue, nSamplesL (×3) and the ASCII ×2
    // bound below stay far from Long overflow — without this, hostile
    // dims near 2^31 wrap nSamplesL*2 negative and slip the bounds
    if (nPxL > Int.MaxValue) return None
    val nSamplesL = nPxL * channels
    if (bitmap && raw) { // P4: MSB-first packed bits, rows byte-padded
      val rowBytesL = (width.toLong + 7) / 8
      val dataStart = hdr._2 + 1
      if (hdr._2 >= payload.length || !isPnmSpace(payload(hdr._2)) ||
          dataStart.toLong + rowBytesL * height > payload.length)
        return None
      val rowBytes = rowBytesL.toInt
      val luma = new Array[Int](nPxL.toInt)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val bit = (payload(dataStart + y * rowBytes + (x >> 3)) >>
            (7 - (x & 7))) & 1
          luma(y * width + x) = if (bit == 1) 0 else 255 // 1 = black
          x += 1
        }
        y += 1
      }
      return Some(DecodedImage(width, height, luma))
    }
    if (bitmap) { // P1: '0'/'1' digits, separating whitespace OPTIONAL
      // every pixel needs ≥ 1 byte — bounds the allocation to the payload
      if (nPxL > payload.length.toLong - hdr._2) return None
      val luma = new Array[Int](nPxL.toInt)
      var pos = hdr._2
      var p = 0
      while (p < luma.length) {
        var c = -1
        while (c == -1) {
          if (pos >= payload.length) return None
          val b = payload(pos)
          if (isPnmSpace(b)) pos += 1
          else if (b == '#') { // comment runs to end of line
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else c = b & 0xff
        }
        if (c != '0' && c != '1') return None
        luma(p) = if (c == '1') 0 else 255 // 1 = black
        pos += 1
        p += 1
      }
      return Some(DecodedImage(width, height, luma))
    }
    if (raw) {
      // exactly ONE whitespace byte separates maxval from the sample
      // bytes (the netpbm raw-format rule)
      val dataStart = hdr._2 + 1
      if (hdr._2 >= payload.length || !isPnmSpace(payload(hdr._2)) ||
          dataStart.toLong + nSamplesL > payload.length)
        return None
      val luma = new Array[Int](nPxL.toInt)
      var p = 0
      while (p < luma.length) {
        val s = dataStart + p * channels
        luma(p) =
          if (channels == 1) payload(s) & 0xff
          else (299 * (payload(s) & 0xff) + 587 * (payload(s + 1) & 0xff) +
            114 * (payload(s + 2) & 0xff)) / 1000
        p += 1
      }
      Some(DecodedImage(width, height, luma))
    } else {
      // ASCII samples: each needs >= 2 payload bytes (digit + separator),
      // so this bound rejects hostile dimensions BEFORE the allocation
      if (nSamplesL * 2 > payload.length.toLong - hdr._2) return None
      val samples = pnmTokens(payload, hdr._2, nSamplesL.toInt) match {
        case Some((s, _)) => s
        case None => return None
      }
      var i = 0
      while (i < samples.length) {
        if (samples(i) > maxval) return None
        i += 1
      }
      val luma = new Array[Int](nPxL.toInt)
      var p = 0
      while (p < luma.length) {
        luma(p) =
          if (channels == 1) samples(p)
          else (299 * samples(p * 3) + 587 * samples(p * 3 + 1) +
            114 * samples(p * 3 + 2)) / 1000
        p += 1
      }
      Some(DecodedImage(width, height, luma))
    }
  }

  private def isPnmSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n'

  // ---- PNG (ISO/IEC 15948, public spec) --------------------------------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Paeth predictor (PNG filter type 4): the neighbor — left, above, or
    * upper-left — closest to the linear prediction a + b − c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // Adam7 pass geometry (PNG spec §8.2): x/y start offsets and strides of
  // the seven reduced images, in transmission order
  private val A7xs = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7ys = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7xd = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7yd = Array(8, 8, 8, 4, 4, 2, 2)

  /** Samples per pixel for a PNG colour type; −1 for an illegal type. */
  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  /** The legal (colour type, bit depth) pairs of PNG spec §11.2.2. */
  private def pngDepthLegal(colorType: Int, d: Int): Boolean = colorType match {
    case 0 => d == 1 || d == 2 || d == 4 || d == 8 || d == 16
    case 3 => d == 1 || d == 2 || d == 4 || d == 8
    case _ => d == 8 || d == 16
  }

  /** The sub-images of one PNG raster: the whole image (interlace 0) or
    * the non-empty Adam7 passes (interlace 1), as (xs, ys, xd, yd, w, h). */
  private def pngPasses(width: Int, height: Int,
      interlace: Boolean): Array[(Int, Int, Int, Int, Int, Int)] =
    if (!interlace) Array((0, 0, 1, 1, width, height))
    else Array.tabulate(7) { p =>
      val pw = (width - A7xs(p) + A7xd(p) - 1) / A7xd(p)
      val ph = (height - A7ys(p) + A7yd(p) - 1) / A7yd(p)
      (A7xs(p), A7ys(p), A7xd(p), A7yd(p), pw, ph)
    }.filter(t => t._5 > 0 && t._6 > 0)

  /** Decode a PNG (colour types 0 gray, 2 RGB, 3 palette, 4 gray+alpha,
    * 6 RGBA at every spec-legal bit depth — 1/2/4-bit samples expand by
    * the exact 255/(2^d−1) multiplier, 16-bit samples reduce to their
    * high byte, palette entries reduce by BT.601, alpha is ignored for
    * luminance — exactly as [[decodeBmp]]) to top-down row-major luma via
    * `java.util.zip.Inflater`: chunk walk with per-chunk CRC32
    * verification, multi-IDAT concatenation, PLTE validation (required
    * for type 3, before IDAT, ≤ 2^depth entries, out-of-range indices
    * refuse), per-row unfiltering (types 0–4) with the filter byte
    * distance of spec §9.2, and the Adam7 7-pass deinterlace (each pass
    * an independently filtered reduced image). `None` — never a crash —
    * for anything else: bad signature/CRC, illegal type/depth pairs,
    * truncated or over-long IDAT streams, and hostile dimensions
    * (refused BEFORE any allocation-sized arithmetic, the [[decodePnm]]
    * discipline). */
  def decodePng(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload.length < 8 + 25 + 12) return None
    var i = 0
    while (i < 8) { if (payload(i) != PngSig(i)) return None; i += 1 }
    // IHDR must be the first chunk (length 13)
    if (be32(payload, 8) != 13 || payload(12) != 'I' || payload(13) != 'H' ||
        payload(14) != 'D' || payload(15) != 'R') return None
    val width = be32(payload, 16)
    val height = be32(payload, 20)
    val bitDepth = payload(24) & 0xff
    val colorType = payload(25) & 0xff
    val interlace = payload(28) & 0xff
    // compression 0 (deflate), filter method 0, interlace 0 or 1 (Adam7)
    if (width <= 0 || height <= 0 ||
        payload(26) != 0 || payload(27) != 0 || interlace > 1) return None
    val channels = pngChannels(colorType)
    if (channels < 0 || !pngDepthLegal(colorType, bitDepth)) return None
    val nPxL = width.toLong * height
    if (nPxL > Int.MaxValue) return None
    val bitsPx = channels * bitDepth
    val passes = pngPasses(width, height, interlace == 1)
    // raster = per sub-image, one filter byte + ceil(w·bitsPx/8) per row
    val rasterL = passes.map { case (_, _, _, _, pw, ph) =>
      ((pw.toLong * bitsPx + 7) / 8 + 1) * ph
    }.sum
    if (rasterL > Int.MaxValue) return None
    // chunk walk: 4-byte BE length, 4-byte type, data, 4-byte CRC over
    // type+data — a mismatch anywhere refuses the whole payload
    var pos = 8
    var idatLen = 0L
    val idatSpans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var plte: Array[Int] = null // luma per palette entry
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 12 > payload.length) return None
      val len = be32(payload, pos)
      if (len < 0 || pos + 12L + len > payload.length) return None
      val crc = new java.util.zip.CRC32
      crc.update(payload, pos + 4, len + 4)
      if (crc.getValue.toInt != be32(payload, pos + 8 + len)) return None
      val t = new String(payload, pos + 4, 4, "US-ASCII")
      t match {
        case "IDAT" => idatSpans += ((pos + 8, len)); idatLen += len
        case "IEND" => sawEnd = true
        case "IHDR" if pos != 8 => return None // duplicate header
        case "PLTE" =>
          // spec §11.2.3: one PLTE, before IDAT, 1–256 RGB triples, and
          // never for the grayscale colour types
          if (plte != null || idatLen > 0 || len == 0 || len % 3 != 0 ||
              len > 768 || colorType == 0 || colorType == 4) return None
          val base = pos + 8
          plte = Array.tabulate(len / 3) { e =>
            (299 * (payload(base + e * 3) & 0xff) +
              587 * (payload(base + e * 3 + 1) & 0xff) +
              114 * (payload(base + e * 3 + 2) & 0xff)) / 1000
          }
        case _ => // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (idatLen == 0L || idatLen > payload.length) return None
    if (colorType == 3 && plte == null) return None
    val comp = new Array[Byte](idatLen.toInt)
    var o = 0
    idatSpans.foreach { case (off, len) =>
      System.arraycopy(payload, off, comp, o, len); o += len
    }
    val raster = new Array[Byte](rasterL.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var got = 0
      var stalled = false
      while (got < raster.length && !stalled) {
        val n = inf.inflate(raster, got, raster.length - got)
        got += n
        if (n == 0 && (inf.finished() || inf.needsInput() ||
            inf.needsDictionary())) stalled = true
      }
      if (got < raster.length) return None // truncated IDAT
      // a stream decompressing to MORE than the declared raster is lying
      // about its dimensions — refuse, don't silently crop
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val fbpp = math.max(1, bitsPx / 8) // filter byte distance, spec §9.2
    val plteN = if (plte == null) 0 else plte.length
    val subMul = if (bitDepth < 8) 255 / ((1 << bitDepth) - 1) else 1
    val luma = new Array[Int](nPxL.toInt)
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (xs, ys, xd, yd, pw, ph) = passes(pi)
      val rowBytes = ((pw.toLong * bitsPx + 7) / 8).toInt
      var cur = new Array[Int](rowBytes)
      var prev = new Array[Int](rowBytes) // zeros: the pass's virtual row −1
      var y = 0
      while (y < ph) {
        val ft = raster(base) & 0xff
        if (ft > 4) return None
        var x = 0
        while (x < rowBytes) {
          val raw = raster(base + 1 + x) & 0xff
          val a = if (x >= fbpp) cur(x - fbpp) else 0
          val b = prev(x)
          val c = if (x >= fbpp) prev(x - fbpp) else 0
          cur(x) = ft match {
            case 0 => raw
            case 1 => (raw + a) & 0xff
            case 2 => (raw + b) & 0xff
            case 3 => (raw + (a + b) / 2) & 0xff
            case _ => (raw + paeth(a, b, c)) & 0xff
          }
          x += 1
        }
        var px = 0
        while (px < pw) {
          val l: Int =
            if (bitDepth == 8) {
              val s = px * channels
              colorType match {
                case 0 | 4 => cur(s) // gray(+alpha): sample 0 IS the luma
                case 3 =>
                  val idx = cur(s)
                  if (idx >= plteN) return None
                  plte(idx)
                case _ =>
                  (299 * cur(s) + 587 * cur(s + 1) + 114 * cur(s + 2)) / 1000
              }
            } else if (bitDepth == 16) {
              // 16-bit samples reduce to the high byte (the standard 8-bit
              // reduction; cross-checked against the JDK's raster >> 8)
              val s = px * channels * 2
              if (channels <= 2) cur(s)
              else (299 * cur(s) + 587 * cur(s + 2) + 114 * cur(s + 4)) / 1000
            } else {
              // 1/2/4-bit: MSB-first packed single-channel samples
              val bitOff = px * bitDepth
              val v = (cur(bitOff >> 3) >>
                (8 - bitDepth - (bitOff & 7))) & ((1 << bitDepth) - 1)
              if (colorType == 0) v * subMul // exact: 255, 85, or 17
              else {
                if (v >= plteN) return None
                plte(v)
              }
            }
          luma((ys + y * yd) * width + xs + px * xd) = l
          px += 1
        }
        val t = prev; prev = cur; cur = t
        base += 1 + rowBytes
        y += 1
      }
      pi += 1
    }
    Some(DecodedImage(width, height, luma))
  }

  /** Encode a PNG at `colorType` (0/2/3/4/6) and `bitDepth` (any
    * spec-legal pair), optionally Adam7-`interlace`d — gray types store
    * the integer BT.601 luma of `rgb` (sub-8-bit gray requires the luma
    * exactly representable: a multiple of 255/(2^d−1)); 16-bit samples
    * store v·0x101 so the decoder's high-byte reduction round-trips
    * exactly; palette type 3 builds its PLTE from the distinct colours in
    * first-visit order (must fit 2^depth entries); alpha channels store a
    * deterministic NON-opaque value so a decode that mistakes alpha for a
    * color sample breaks loudly. `rowFilter(i)` picks each emitted row's
    * filter type (0–4) by its transmission index — each Adam7 pass is an
    * independently filtered reduced image — defaulting to a rotation
    * through all five so the encode → decode round-trip proves the
    * unfilter math, not just filter-0 parsing; the IDAT stream is always
    * split in two so multi-chunk concatenation is exercised. The fixture
    * generator for the decode gate + specs, like
    * [[encodeBmp24]]/[[encodePpm]]. */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int),
      colorType: Int = 2, rowFilter: Int => Int = _ % 5,
      bitDepth: Int = 8, interlace: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val channels = pngChannels(colorType)
    require(channels > 0 && pngDepthLegal(colorType, bitDepth),
      s"illegal colorType $colorType / bitDepth $bitDepth")
    val palette = scala.collection.mutable.LinkedHashMap.empty[(Int, Int, Int), Int]
    if (colorType == 3) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val c = rgb(x, y)
          if (!palette.contains(c)) palette(c) = palette.size
          x += 1
        }
        y += 1
      }
      require(palette.size <= (1 << bitDepth),
        s"palette overflow: ${palette.size} colours at depth $bitDepth")
    }
    val subMul = if (bitDepth < 8) 255 / ((1 << bitDepth) - 1) else 1
    def expand(v: Int): Int = if (bitDepth == 16) (v << 8) | v else v
    // one pixel's samples, in PNG sample units at bitDepth
    def samples(x: Int, y: Int): Array[Int] = {
      val (r, g, b) = rgb(x, y)
      colorType match {
        case 0 =>
          val l = (299 * r + 587 * g + 114 * b) / 1000
          if (bitDepth < 8) {
            require(l % subMul == 0,
              s"luma $l not representable at depth $bitDepth")
            Array(l / subMul)
          } else Array(expand(l))
        case 2 => Array(expand(r), expand(g), expand(b))
        case 3 => Array(palette((r, g, b)))
        case 4 =>
          val l = (299 * r + 587 * g + 114 * b) / 1000
          Array(expand(l), expand((x * 7 + y * 13) % 256))
        case _ =>
          Array(expand(r), expand(g), expand(b), expand((x * 7 + y * 13) % 256))
      }
    }
    val bitsPx = channels * bitDepth
    val fbpp = math.max(1, bitsPx / 8)
    val rawOut = new java.io.ByteArrayOutputStream()
    var rowIdx = 0
    pngPasses(width, height, interlace).foreach {
      case (xs, ys, xd, yd, pw, ph) =>
        val rowBytes = ((pw.toLong * bitsPx + 7) / 8).toInt
        var cur = new Array[Int](rowBytes)
        var prev = new Array[Int](rowBytes) // zeros: the pass's virtual row −1
        var y = 0
        while (y < ph) {
          java.util.Arrays.fill(cur, 0)
          var px = 0
          var bitPos = 0
          while (px < pw) {
            val ss = samples(xs + px * xd, ys + y * yd)
            var si = 0
            while (si < ss.length) {
              val v = ss(si)
              if (bitDepth == 16) {
                cur(bitPos >> 3) = (v >> 8) & 0xff
                cur((bitPos >> 3) + 1) = v & 0xff
                bitPos += 16
              } else if (bitDepth == 8) {
                cur(bitPos >> 3) = v & 0xff
                bitPos += 8
              } else {
                val sh = 8 - bitDepth - (bitPos & 7)
                cur(bitPos >> 3) |= (v & ((1 << bitDepth) - 1)) << sh
                bitPos += bitDepth
              }
              si += 1
            }
            px += 1
          }
          val ft = rowFilter(rowIdx)
          require(ft >= 0 && ft <= 4, s"bad filter type $ft")
          rawOut.write(ft)
          var x = 0
          while (x < rowBytes) {
            val a = if (x >= fbpp) cur(x - fbpp) else 0
            val b = prev(x)
            val c = if (x >= fbpp) prev(x - fbpp) else 0
            val f = ft match {
              case 0 => cur(x)
              case 1 => cur(x) - a
              case 2 => cur(x) - b
              case 3 => cur(x) - (a + b) / 2
              case _ => cur(x) - paeth(a, b, c)
            }
            rawOut.write(f & 0xff)
            x += 1
          }
          val t = prev; prev = cur; cur = t
          rowIdx += 1
          y += 1
        }
    }
    val cbos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(cbos)
    dos.write(rawOut.toByteArray); dos.close()
    val comp = cbos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def putBe32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      putBe32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val c = new java.util.zip.CRC32
      c.update(tb); c.update(data)
      putBe32(c.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    def ihdrBe32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xff).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte
      ihdr(off + 3) = (v & 0xff).toByte
    }
    ihdrBe32(0, width); ihdrBe32(4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlace) 1 else 0 // compr/filter stay 0
    chunk("IHDR", ihdr)
    if (colorType == 3) {
      val pb = new Array[Byte](palette.size * 3)
      palette.foreach { case ((r, g, b), i) =>
        pb(i * 3) = (r & 0xff).toByte
        pb(i * 3 + 1) = (g & 0xff).toByte
        pb(i * 3 + 2) = (b & 0xff).toByte
      }
      chunk("PLTE", pb)
    }
    val half = math.max(comp.length / 2, 1)
    chunk("IDAT", comp.take(half))
    if (comp.length > half) chunk("IDAT", comp.drop(half))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- GIF (87a/89a, public spec) ---------------------------------------

  /** Read a GIF color table at `off` as integer BT.601 luma per entry. */
  private def gifPalette(b: Array[Byte], off: Int, count: Int): Array[Int] =
    Array.tabulate(count) { i =>
      (299 * (b(off + i * 3) & 0xff) + 587 * (b(off + i * 3 + 1) & 0xff) +
        114 * (b(off + i * 3 + 2) & 0xff)) / 1000
    }

  /** Decode a GIF87a/89a's FIRST image to top-down row-major luma
    * (palette entries reduced by the same integer BT.601 as every codec
    * here): logical-screen + image-descriptor walk, global/local color
    * tables, extension-block skipping, sub-block reassembly, a full LZW
    * decoder (variable code width 3–12 bits LSB-first, clear/EOI codes,
    * the KwKwK case), and the 4-pass interlace row order (the JDK's own
    * writer emits interlaced GIFs by default — a web corpus is full of
    * them). `None` — never a crash — for malformations: codes beyond the
    * table, palette overruns, output over/underrun vs the declared dims,
    * truncated streams, hostile dimensions refused before allocation. */
  def decodeGif(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload.length < 14) return None
    val hdr = new String(payload, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val screenW = le16(payload, 6)
    val screenH = le16(payload, 8)
    val packed = payload(10) & 0xff
    var pos = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val count = 1 << ((packed & 7) + 1)
      if (pos + 3 * count > payload.length) return None
      gct = gifPalette(payload, pos, count)
      pos += 3 * count
    }
    while (pos < payload.length) {
      (payload(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte, then sub-blocks to a 0
          pos += 2
          var done = false
          while (!done) {
            if (pos >= payload.length) return None
            val n = payload(pos) & 0xff
            pos += 1 + n
            if (n == 0) done = true
          }
        case 0x2c =>
          if (pos + 10 > payload.length) return None
          val left = le16(payload, pos + 1)
          val top = le16(payload, pos + 3)
          val w = le16(payload, pos + 5)
          val h = le16(payload, pos + 7)
          val ip = payload(pos + 9) & 0xff
          pos += 10
          // a frame positioned inside a larger logical screen would need
          // screen compositing to decode faithfully — out of the strict
          // decode-or-None contract, so refuse rather than silently drop
          // the placement (ADVICE r13)
          if (left != 0 || top != 0 || w != screenW || h != screenH)
            return None
          var pal = gct
          if ((ip & 0x80) != 0) {
            val count = 1 << ((ip & 7) + 1)
            if (pos + 3 * count > payload.length) return None
            pal = gifPalette(payload, pos, count)
            pos += 3 * count
          }
          if (pal == null || w <= 0 || h <= 0) return None
          if (w.toLong * h > Int.MaxValue) return None
          if (pos >= payload.length) return None
          val minCode = payload(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // reassemble the LZW stream from its length-prefixed sub-blocks
          val blocks = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= payload.length) return None
            val n = payload(pos) & 0xff
            if (pos + 1 + n > payload.length) return None
            blocks.write(payload, pos + 1, n)
            pos += 1 + n
            if (n == 0) done = true
          }
          return gifLzwDecode(blocks.toByteArray, minCode, pal, w, h)
            .map { img =>
              if ((ip & 0x40) == 0) img
              else { // 4-pass interlace: sequential rows land at 0,8,16…
                val order = (0 until h by 8) ++ (4 until h by 8) ++
                  (2 until h by 4) ++ (1 until h by 2)
                val luma = new Array[Int](img.luma.length)
                order.zipWithIndex.foreach { case (dst, src) =>
                  System.arraycopy(img.luma, src * w, luma, dst * w, w)
                }
                DecodedImage(w, h, luma)
              }
            }
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW over a reassembled code stream: decoded indexes map
    * through `pal` into luma; any structural lie (code beyond the table,
    * more or fewer pixels than w×h, palette overrun) returns None. */
  private def gifLzwDecode(data: Array[Byte], minCode: Int,
      pal: Array[Int], w: Int, h: Int): Option[DecodedImage] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = eoi + 1
    var width = minCode + 1
    val nPx = w * h
    val out = new Array[Int](nPx)
    var outPos = 0
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    var prev = -1
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0; var i = 0
      while (i < width) {
        val b = bitPos + i
        if (((data((b >> 3).toInt) >> (b & 7).toInt) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    def firstOf(code: Int): Byte = {
      var c = code
      while (c > eoi) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      if (c >= clear) return false // a chain must root at a literal
      stack(sp) = c.toByte; sp += 1
      while (sp > 0) {
        sp -= 1
        if (outPos >= nPx) return false // lying dims: too many pixels
        val idx = stack(sp) & 0xff
        if (idx >= pal.length) return false
        out(outPos) = pal(idx); outPos += 1
      }
      true
    }
    var code = read()
    while (code != -1) {
      if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outPos == nPx) Some(DecodedImage(w, h, out)) else None
      } else if (prev == -1) {
        if (code >= clear) return None // the first code must be a literal
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next) return None // a code the table cannot hold yet
        if (code == next) { // KwKwK: the entry being defined right now
          if (next >= 4096) return None
          prefix(next) = prev; suffix(next) = firstOf(prev)
          next += 1
          if (!emit(code)) return None
        } else {
          if (!emit(code)) return None
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstOf(code)
            next += 1
          }
        }
        prev = code
        if (next == (1 << width) && width < 12) width += 1
      }
      code = read()
    }
    None // the stream ended without an EOI code
  }

  /** Encode an image as a non-interlaced GIF89a with a global color
    * table and REAL LZW compression (dictionary build, width growth,
    * clear-on-full) — the fixture generator whose round-trip proves the
    * decoder's dictionary/KwKwK/width arithmetic, not just literal
    * parsing. The image must use ≤ 256 distinct colors (it is a GIF). */
  def encodeGif(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val px = Array.tabulate(width * height)(p => rgb(p % width, p / width))
    val colors = px.distinct
    require(colors.length <= 256, s"${colors.length} colors exceed a GIF palette")
    val index = colors.zipWithIndex.toMap
    // palette count is a power of two >= 4 (minCode >= 2 per the format)
    var palBits = 2
    while ((1 << palBits) < colors.length) palBits += 1
    val palCount = 1 << palBits
    val minCode = palBits
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16w(width); le16w(height)
    out.write(0x80 | 0x70 | (palBits - 1)); out.write(0); out.write(0)
    colors.padTo(palCount, (0, 0, 0)).foreach { case (r, g, b) =>
      out.write(r & 0xff); out.write(g & 0xff); out.write(b & 0xff)
    }
    out.write(0x2c); le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(0) // no LCT, not interlaced
    out.write(minCode)
    // LZW: dictionary of (prefix code, next byte); width grows in
    // lockstep with the decoder's table (one entry per emitted code)
    val lzw = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeWidth = minCode + 1
    def write(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeWidth
      while (bitCnt >= 8) {
        lzw.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = eoi + 1
    write(clear)
    var cur = -1
    px.foreach { c =>
      val b = index(c)
      if (cur == -1) cur = b
      else dict.get((cur, b)) match {
        case Some(code) => cur = code
        case None =>
          write(cur)
          if (next < 4096) {
            dict((cur, b)) = next; next += 1
            // the encoder's table runs ONE entry ahead of the decoder's
            // at each code position (it adds after writing code m, the
            // decoder after reading code m+1), so its width bump lags
            // the decoder's `next == 2^width` rule by one entry
            if (next == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
          } else { // table full: clear and restart the dictionary
            write(clear)
            dict.clear(); next = eoi + 1; codeWidth = minCode + 1
          }
          cur = b
      }
    }
    if (cur != -1) write(cur)
    write(eoi)
    if (bitCnt > 0) lzw.write((bitBuf & 0xff).toInt)
    // sub-block framing: <=255-byte chunks, 0 terminator
    val bytes = lzw.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n); out.write(bytes, off, n)
      off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** Route a media payload to its codec by sniffed magic bytes — 'BM' →
    * [[decodeBmp]], the 8-byte PNG signature → [[decodePng]], 'GIF8' →
    * [[decodeGif]], 0xFFD8 → [[decodeJpeg]], 'P2|P3|P5|P6' →
    * [[decodePnm]], anything else `None`: a mixed-format media column
    * decodes per-row with no format column required. The single entry
    * point [[decodeReport]]/[[phashDecoded]] read. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      decodeBmp(payload)
    else if (payload.length >= 4 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
      decodePng(payload)
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == '8')
      decodeGif(payload)
    else if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8)
      decodeJpeg(payload)
    else decodePnm(payload)

  /** Encode top-down row-major RGB as raw (P6) PPM bytes. */
  def encodePpm(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < width * height) {
      val (r, g, b) = rgb(p % width, p / width)
      out(header.length + p * 3) = r.toByte
      out(header.length + p * 3 + 1) = g.toByte
      out(header.length + p * 3 + 2) = b.toByte
      p += 1
    }
    out
  }

  /** Encode top-down row-major grayscale as raw (P5) PGM bytes. */
  def encodePgm(width: Int, height: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < width * height) {
      out(header.length + p) = gray(p % width, p / width).toByte
      p += 1
    }
    out
  }

  /** Encode a bitonal image as PBM — raw P4 (MSB-first bit-packed,
    * byte-padded rows) or ASCII P1 (`packed` drops the optional
    * separators, the spec-legal form a tokenizing reader would misparse).
    * `black(x, y)` = true encodes bit 1 = BLACK (luma 0). The fixture
    * generator proving [[decodePnm]]'s bitmap walk. */
  def encodePbm(width: Int, height: Int, black: (Int, Int) => Boolean,
      raw: Boolean = true, packed: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    if (raw) {
      val rowBytes = (width + 7) / 8
      val header = s"P4\n$width $height\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rowBytes * height)
      System.arraycopy(header, 0, out, 0, header.length)
      for (y <- 0 until height; x <- 0 until width if black(x, y)) {
        val o = header.length + y * rowBytes + (x >> 3)
        out(o) = (out(o) | (1 << (7 - (x & 7)))).toByte
      }
      out
    } else {
      val sb = new StringBuilder(s"P1\n$width $height\n")
      for (y <- 0 until height) {
        for (x <- 0 until width) {
          sb.append(if (black(x, y)) '1' else '0')
          if (!packed && x < width - 1) sb.append(' ')
        }
        sb.append('\n')
      }
      sb.toString.getBytes("US-ASCII")
    }
  }

  /** The dHash signature over a DECODED luminance stream — [[phash]]'s
    * exact arithmetic (NN-resample positions, bit j iff sample j+1 >
    * sample j) with pixels instead of raw payload bytes: the production
    * pixel-domain perceptual hash for the formats the JVM can decode.
    * 0 when the image holds fewer pixels than `samples` (the short-payload
    * rule — callers filter, see [[phash]]). */
  private[graft] def lumaPhash(luma: Array[Int], samples: Int): Long = {
    val n = luma.length
    if (n < samples) return 0L
    var sig = 0L
    var j = 0
    while (j < samples - 1) {
      val a = luma(((j.toLong * n) / samples).toInt)
      val b = luma((((j + 1).toLong * n) / samples).toInt)
      if (b > a) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Per-image decode report — the oracle-gated face of the BMP path:
    * dimensions, exact integer luminance aggregates (`sum_luma`;
    * `pos_checksum` = Σ (p+1)·luma(p) over the top-down row-major pixel
    * index p, which pins the POSITIONAL mapping — a bottom-up flip,
    * padding, or channel-order bug shifts it), and the pixel-domain
    * [[lumaPhash]]. Undecodable payloads are skipped. */
  final case class MediaDecoded(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, sum_luma: Long, pos_checksum: Long, phash: Long)

  def decodeReport(media: Dataset[MediaRow], samples: Int = 49)(
      implicit spark: SparkSession): Dataset[MediaDecoded] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.payload).map { img =>
          val n = img.luma.length
          var sum = 0L; var pos = 0L; var p = 0
          while (p < n) {
            sum += img.luma(p); pos += (p + 1).toLong * img.luma(p); p += 1
          }
          MediaDecoded(r.doc_id, img.width.toLong, img.height.toLong,
            n.toLong, sum, pos, lumaPhash(img.luma, samples))
        }
      }
    }
  }

  /** One cell of a box-downsampled thumbnail: exact integer pixel count,
    * luma sum, and the floor mean — the normalized-resolution face a
    * vision-training pipeline feeds its encoder. */
  final case class ThumbCell(doc_id: Long, cell_x: Long, cell_y: Long,
      n_px: Long, sum_luma: Long, mean_luma: Long)

  /** Box-downsample every decodable image to a `tw`×`th` thumbnail — THE
    * image-prep step of a training pipeline (resolution normalization)
    * done with exactly replayable arithmetic: pixel (x, y) belongs to
    * cell (x·tw/w, y·th/h) (floor — each source pixel lands in exactly
    * one cell, cells absorb the remainder pixels), a cell's mean is
    * floor(sum/count), and only non-empty cells are emitted (an image
    * narrower than the grid leaves gaps, it doesn't upscale). Decode
    * happens once per payload inside the partition; undecodable payloads
    * are skipped, never crash the batch. */
  def thumbnailReport(media: Dataset[MediaRow], tw: Int, th: Int)(
      implicit spark: SparkSession): Dataset[ThumbCell] = {
    require(tw > 0 && th > 0 && tw.toLong * th <= Int.MaxValue,
      s"bad thumb dims: $tw x $th")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.payload).iterator.flatMap { img =>
          val sums = new Array[Long](tw * th)
          val counts = new Array[Long](tw * th)
          var y = 0
          while (y < img.height) {
            val cy = y.toLong * th / img.height
            var x = 0
            while (x < img.width) {
              val cx = x.toLong * tw / img.width
              val c = (cy * tw + cx).toInt
              sums(c) += img.luma(y * img.width + x)
              counts(c) += 1
              x += 1
            }
            y += 1
          }
          (0 until tw * th).iterator.filter(counts(_) > 0).map { c =>
            ThumbCell(r.doc_id, (c % tw).toLong, (c / tw).toLong,
              counts(c), sums(c), sums(c) / counts(c))
          }
        }
      }
    }
  }

  /** Pixel-domain phash rows (doc_id, phash) for decodable payloads with
    * at least `samples` pixels — the drop-in signature source for the
    * banding/pair/probe plumbing above ([[phashPairs]]'s banding applies
    * unchanged). */
  def phashDecoded(media: Dataset[MediaRow], samples: Int = 49)(
      implicit spark: SparkSession): DataFrame =
    decodeReport(media, samples).toDF()
      .filter(col("n_pixels") >= samples)
      .select(col("doc_id"), col("phash"))

  /** Near-dup image pairs by DECODED-pixel phash: band the 48-bit
    * signature, equi-join, exact-hamming verify — identical banding to
    * [[phashPairs]], pixel-domain signatures. */
  def phashDecodedPairs(media: Dataset[MediaRow], maxDist: Int = 3)(
      implicit spark: SparkSession): DataFrame =
    graft.text.TextOps.simhashPairs(
      phashDecoded(media).select(col("doc_id"), col("phash").as("simhash")),
      bits = 48, bandBits = 12, maxDist = maxDist)

  /** Deterministic BMP fixture: a `width`×`height` 24-bit image whose
    * channels at (x, y) are small-prime affine maps of (id, x, y) mod 256
    * — trivially replayable by an SQL oracle, so the gate can pin the
    * whole generate → encode → DECODE → aggregate chain against the
    * generate → aggregate composition (decode correctness is exactly the
    * difference). Width 15 forces 3 bytes of row padding (45 % 4 != 0) so
    * the padding arithmetic is exercised, not dodged. */
  def synthBmp(id: Long, width: Int = 15, height: Int = 17): Array[Byte] =
    ((id / 6) % 4).toInt match {
      // layout variants by (id / 6) — see [[synthPng]] for why the
      // selector divides first: the gate routes one residue class mod 6
      // here. All four encode the same channels, so the oracle replay is
      // untouched; 24-bit bottom-up/top-down, 32-bit BGRx, and the 8-bit
      // colour table (≤ 255 distinct colours at the default dims) all
      // sit behind the hash.
      case 0 => encodeBmp24(width, height, synthChannels(id))
      case 1 => encodeBmp32(width, height, synthChannels(id))
      case 2 => encodeBmp8(width, height, synthChannels(id))
      case _ => encodeBmp24(width, height, synthChannels(id), topDown = true)
    }

  /** [[synthBmp]]'s channel maps, shared by every synthetic-format twin so
    * mixed-format fixtures aggregate to the SAME oracle replay. */
  private def synthChannels(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + x * 3 + y * 5) % 256).toInt,
    ((id * 11 + x * 13 + y * 17) % 256).toInt,
    ((id * 19 + x * 23 + y * 29) % 256).toInt)

  /** [[synthBmp]]'s raw-PPM twin: identical channels, so its decoded luma
    * equals the BMP's and one oracle replay covers both formats. */
  def synthPpm(id: Long, width: Int = 15, height: Int = 17): Array[Byte] =
    encodePpm(width, height, synthChannels(id))

  /** [[synthBmp]]'s raw-PGM twin: gray = the integer BT.601 luma of the
    * same channels, so the decoded luma again equals the BMP's. */
  def synthPgm(id: Long, width: Int = 15, height: Int = 17): Array[Byte] =
    encodePgm(width, height, (x, y) => {
      val (r, g, b) = synthChannels(id)(x, y)
      (299 * r + 587 * g + 114 * b) / 1000
    })

  /** [[synthBmp]]'s PNG twin: identical channels through the real
    * deflate + filter + chunk machinery (colorType rotated by id across
    * gray/RGB/palette/gray-alpha/RGBA so every supported sample layout —
    * including the PLTE path — reaches the gate, with a SIXTH variant
    * re-encoding RGB through the Adam7 7-pass interlace so the
    * deinterlace walk is gated too; the default dims hold ≤ 255 distinct
    * colours, so the palette build always fits), decoded luma again equal
    * to the BMP's. The variant is selected by `(id / 6) % 6` — the gate's
    * doc_id mix routes ids of ONE residue class mod 6 here, so a selector
    * on `id % k` would degenerate; dividing first cycles every variant
    * uniformly over the gated docs. */
  def synthPng(id: Long, width: Int = 15, height: Int = 17): Array[Byte] = {
    val v = ((id / 6) % 6).toInt
    if (v == 5)
      encodePng(width, height, synthChannels(id), colorType = 2,
        interlace = true)
    else
      encodePng(width, height, synthChannels(id),
        colorType = Seq(0, 2, 3, 4, 6)(v))
  }

  /** [[synthBmp]]'s GIF twin: identical channels (≤ 255 distinct colors
    * at the default dims — each pixel gets a palette slot) through the
    * real LZW machinery, decoded luma again equal to the BMP's. */
  def synthGif(id: Long, width: Int = 15, height: Int = 17): Array[Byte] =
    encodeGif(width, height, synthChannels(id))

  // ---- RIFF/WAVE PCM (the audio twin of the image codecs) --------------

  /** Decoded audio: rate/channel metadata plus the MONO sample stream —
    * stereo is downmixed per frame as `(l + r) >> 1` (arithmetic shift =
    * floor division, the convention an SQL replay reproduces with `//`).
    * 8-bit samples (unsigned per the format) are centered to `v − 128`;
    * 16- and 24-bit samples keep their native signed width; 32-bit float
    * samples land on the 16-bit grid as `round(v · 32768)` clamped to
    * [−32768, 32767]. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Int])

  // KSDATAFORMAT subtype GUID tail shared by the PCM and float subtypes
  // of WAVE_FORMAT_EXTENSIBLE: ....-0000-0010-8000-00AA00389B71
  private val WavExtGuidTail = Array(
    0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)

  /** Decode a RIFF/WAVE payload holding integer PCM (format 1; 8-bit
    * unsigned, 16- or 24-bit little-endian signed) or IEEE float PCM
    * (format 3; 32-bit), plainly or wrapped in WAVE_FORMAT_EXTENSIBLE
    * (format 0xFFFE — the effective format resolves from the SubFormat
    * GUID, anything but the PCM/float subtypes refuses), mono or stereo,
    * to the mono sample stream: RIFF chunk walk (even-padded sizes),
    * `fmt ` before `data`, size arithmetic in Long, and the same
    * never-crash-the-batch contract as [[decodeBmp]] — compressed
    * formats, other widths, >2 channels, non-finite float samples,
    * truncated or hostile chunk sizes all decode to None. */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload.length < 44 || payload(0) != 'R' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'W' ||
        payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    var pos = 12L
    // (channels, rate, block, bits, isFloat)
    var fmt: Option[(Int, Int, Int, Int, Boolean)] = None
    while (pos + 8 <= payload.length) {
      val p = pos.toInt
      val id = new String(payload, p, 4, "US-ASCII")
      val size = le32(payload, p + 4).toLong & 0xffffffffL
      val body = pos + 8
      if (body + size > payload.length) return None // lying chunk size
      if (id == "fmt ") {
        if (size < 16) return None
        val b = body.toInt
        val rawFormat = le16(payload, b)
        val channels = le16(payload, b + 2)
        val rate = le32(payload, b + 4)
        val block = le16(payload, b + 12)
        val bits = le16(payload, b + 14)
        val audioFormat =
          if (rawFormat != 0xfffe) rawFormat
          else {
            // WAVE_FORMAT_EXTENSIBLE: cbSize ≥ 22 and the effective
            // format is the SubFormat GUID's Data1 low half; everything
            // after it must be the fixed KSDATAFORMAT tail
            if (size < 40 || le16(payload, b + 16) < 22 ||
                le16(payload, b + 26) != 0) return None
            var k = 0
            while (k < 12) {
              if ((payload(b + 28 + k) & 0xff) != WavExtGuidTail(k))
                return None
              k += 1
            }
            le16(payload, b + 24)
          }
        val legal =
          (audioFormat == 1 && (bits == 8 || bits == 16 || bits == 24)) ||
            (audioFormat == 3 && bits == 32)
        if (!legal || channels < 1 || channels > 2 || rate <= 0 ||
            block != channels * (bits / 8)) return None
        fmt = Some((channels, rate, block, bits, audioFormat == 3))
      } else if (id == "data") {
        val (channels, rate, block, bits, isFloat) = fmt match {
          case Some(f) => f
          case None => return None // data before fmt: refuse, don't guess
        }
        val nFrames = size / block // payload-bounded, fits an Int
        val out = new Array[Int](nFrames.toInt)
        val base = body.toInt
        var nonFinite = false
        def sample(off: Int): Int = bits match {
          case 8 => (payload(off) & 0xff) - 128
          case 16 => (payload(off) & 0xff) | (payload(off + 1) << 8)
          case 24 => (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
            (payload(off + 2) << 16) // the top byte's sign extends
          case _ => // 32-bit IEEE float
            val v = java.lang.Float.intBitsToFloat(le32(payload, off))
            if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v)) {
              nonFinite = true; 0
            } else math.min(32767, math.max(-32768, math.round(v * 32768f)))
        }
        var i = 0
        while (i < out.length) {
          val f = base + i * block
          out(i) =
            if (channels == 1) sample(f)
            else (sample(f) + sample(f + bits / 8)) >> 1
          i += 1
        }
        if (nonFinite) return None // a NaN/Inf sample poisons the payload
        return Some(DecodedAudio(rate, channels, out))
      }
      pos = body + size + (size & 1L) // chunks are even-padded
    }
    None // no data chunk reached
  }

  /** Shared RIFF/WAVE builder: `sample(i, c)` supplies frame i / channel
    * c as the Int whose low `bits/8` bytes are written little-endian (for
    * float, the IEEE bit pattern). `extensible` wraps the format in
    * WAVE_FORMAT_EXTENSIBLE with the matching SubFormat GUID. */
  private def buildWav(fmtCode: Int, sampleRate: Int, channels: Int,
      nFrames: Int, bits: Int, extensible: Boolean,
      sample: (Int, Int) => Int): Array[Byte] = {
    val bytes = bits / 8
    val block = channels * bytes
    val dataSize = nFrames * block
    val fmtSize = if (extensible) 40 else 16
    val out = new Array[Byte](20 + fmtSize + 8 + dataSize)
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLE32(off: Int, v: Int): Unit = {
      putLE16(off, v & 0xffff); putLE16(off + 2, (v >>> 16) & 0xffff)
    }
    def putTag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    putTag(0, "RIFF"); putLE32(4, out.length - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); putLE32(16, fmtSize)
    putLE16(20, if (extensible) 0xfffe else fmtCode)
    putLE16(22, channels)
    putLE32(24, sampleRate); putLE32(28, sampleRate * block)
    putLE16(32, block); putLE16(34, bits)
    if (extensible) {
      putLE16(36, 22)   // cbSize
      putLE16(38, bits) // wValidBitsPerSample
      putLE32(40, if (channels == 2) 3 else 4) // dwChannelMask
      putLE16(44, fmtCode); putLE16(46, 0)     // SubFormat GUID Data1
      WavExtGuidTail.zipWithIndex.foreach { case (b, i) =>
        out(48 + i) = b.toByte
      }
    }
    val dataOff = 20 + fmtSize
    putTag(dataOff, "data"); putLE32(dataOff + 4, dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val off = dataOff + 8 + i * block + c * bytes
        val v = sample(i, c)
        var k = 0
        while (k < bytes) {
          out(off + k) = ((v >> (8 * k)) & 0xff).toByte
          k += 1
        }
        c += 1
      }
      i += 1
    }
    out
  }

  /** Encode integer PCM as a RIFF/WAVE payload — the fixture generator
    * for the decode gate + specs ([[encodeBmp24]]'s role for audio).
    * `frames(i)` supplies the per-channel samples of frame i (signed
    * range for bits=16/24; 0–255 for bits=8). */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
      frames: Int => Seq[Int], bits: Int = 16,
      extensible: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 2 &&
      (bits == 8 || bits == 16 || bits == 24),
      s"channels=$channels bits=$bits")
    buildWav(1, sampleRate, channels, nFrames, bits, extensible,
      (i, c) => frames(i)(c))
  }

  /** [[encodeWav]]'s IEEE-float twin (format 3, 32-bit samples). */
  def encodeWavFloat(sampleRate: Int, channels: Int, nFrames: Int,
      frames: Int => Seq[Float], extensible: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 2, s"channels=$channels")
    buildWav(3, sampleRate, channels, nFrames, 32, extensible,
      (i, c) => java.lang.Float.floatToIntBits(frames(i)(c)))
  }

  /** Per-payload audio-decode report — the oracle-gated face of the WAV
    * path ([[decodeReport]]'s audio twin): exact integer aggregates over
    * the decoded mono stream. `pos_checksum` = Σ (i+1)·s(i) pins the
    * POSITIONAL mapping (an interleave, downmix, or endianness bug
    * shifts it); `zero_crossings` counts sign flips (negative ↔
    * non-negative between consecutive samples). Undecodable payloads are
    * skipped, never crash the batch. */
  final case class AudioDecoded(doc_id: Long, sample_rate: Long,
      n_samples: Long, sum_abs: Long, pos_checksum: Long, peak: Long,
      zero_crossings: Long)

  def audioReport(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[AudioDecoded] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload).map { a =>
          var sumAbs = 0L; var pos = 0L; var peak = 0L; var zc = 0L
          var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i)
            sumAbs += math.abs(s).toLong
            pos += (i + 1).toLong * s
            peak = math.max(peak, math.abs(s).toLong)
            if (i > 0 && (a.samples(i - 1) < 0) != (s < 0)) zc += 1
            i += 1
          }
          AudioDecoded(r.doc_id, a.sampleRate.toLong, a.samples.length.toLong,
            sumAbs, pos, peak, zc)
        }
      }
    }
  }

  /** Aggregates of a linearly resampled clip ([[audioResampleReport]]):
    * the sample-rate-normalization face an ASR pipeline feeds its
    * encoder. */
  final case class AudioResampled(doc_id: Long, src_rate: Long,
      dst_rate: Long, n_samples: Long, sum_abs: Long, pos_checksum: Long,
      peak: Long, zero_crossings: Long)

  /** Resample every decodable clip to `dstRate` by linear interpolation
    * in exact integer arithmetic — THE audio-prep step (rate
    * normalization) with a replayable convention: output j sits at
    * source position t = j·src/dst, so `i0 = t` (floor), `fr = (j·src)
    * mod dst`, and `out(j) = floor((s(i0)·(dst−fr) + s(i1)·fr) / dst)`
    * with `i1 = min(i0+1, n−1)` (floor division — negative samples round
    * DOWN, matching SQL `//`). The output length is `n·dst/src` (floor).
    * The resampled stream reduces to the same exact aggregates as
    * [[audioReport]]; clips that resample to nothing and undecodable
    * payloads are skipped. */
  def audioResampleReport(media: Dataset[MediaRow], dstRate: Int)(
      implicit spark: SparkSession): Dataset[AudioResampled] = {
    require(dstRate > 0, s"dstRate must be positive: $dstRate")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload).flatMap { a =>
          val n = a.samples.length
          val outL = n.toLong * dstRate / a.sampleRate
          // a hostile rate pair exploding the output length skips the
          // payload (decode-or-None), it never wraps the Int allocation
          if (outL > Int.MaxValue) None
          else if (outL <= 0) None
          else {
            val outN = outL.toInt
            var sumAbs = 0L; var pos = 0L; var peak = 0L; var zc = 0L
            var prev = 0
            var j = 0
            while (j < outN) {
              val t = j.toLong * a.sampleRate
              val i0 = (t / dstRate).toInt
              val fr = (t % dstRate).toInt
              val i1 = math.min(i0 + 1, n - 1)
              val s = Math.floorDiv(
                a.samples(i0).toLong * (dstRate - fr) +
                  a.samples(i1).toLong * fr, dstRate.toLong).toInt
              sumAbs += math.abs(s).toLong
              pos += (j + 1).toLong * s
              peak = math.max(peak, math.abs(s).toLong)
              if (j > 0 && (prev < 0) != (s < 0)) zc += 1
              prev = s
              j += 1
            }
            Some(AudioResampled(r.doc_id, a.sampleRate.toLong,
              dstRate.toLong, outN.toLong, sumAbs, pos, peak, zc))
          }
        }
      }
    }
  }

  /** Windowed audio energy — the silence-trim primitive an ASR-corpus
    * pipeline runs before anything else: the decoded mono stream splits
    * into fixed `win`-sample windows (the last one partial) and each
    * reduces to exact integer aggregates; a downstream
    * `filter(sum_abs >= threshold)` IS the trim. Decode happens once per
    * payload inside the partition; the per-window rows then flow through
    * ordinary codegen'd aggregation — no driver involvement, no second
    * decode. Undecodable payloads are skipped. */
  final case class AudioWindow(doc_id: Long, window_id: Long,
      n_samples: Long, sum_abs: Long, peak: Long)

  def audioEnergyWindows(media: Dataset[MediaRow], win: Int)(
      implicit spark: SparkSession): Dataset[AudioWindow] = {
    require(win > 0, s"window must be positive: $win")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload).iterator.flatMap { a =>
          val nWin = (a.samples.length + win - 1) / win
          (0 until nWin).iterator.map { w =>
            var sumAbs = 0L; var peak = 0L
            var i = w * win
            val end = math.min(i + win, a.samples.length)
            val n = end - i
            while (i < end) {
              val s = math.abs(a.samples(i)).toLong
              sumAbs += s; peak = math.max(peak, s)
              i += 1
            }
            AudioWindow(r.doc_id, w.toLong, n.toLong, sumAbs, peak)
          }
        }
      }
    }
  }

  /** Deterministic WAV fixture: frame i's per-channel samples are
    * small-prime affine maps of (id, i, channel) — trivially replayable
    * by an SQL oracle ([[synthBmp]]'s role for audio). doc_id routes the
    * FORMAT so every decode face is exercised at the gate, not dodged:
    * id%4 = 0 mono 16-bit, 1 stereo 16-bit (the downmix), 2 mono 24-bit
    * (full signed 24-bit range), 3 mono 32-bit float wrapped in
    * WAVE_FORMAT_EXTENSIBLE — the float samples are the 16-bit map's
    * values over 32768 (exact dyadics), so `round(v · 32768)` replays to
    * the same integers as the mono-16 branch. */
  def synthWav(id: Long, nFrames: Int = 256): Array[Byte] = {
    def k(i: Int, c: Int): Int =
      ((id * 131 + i.toLong * 37 + c * 4099) % 65536L).toInt - 32768
    (id % 4) match {
      case 0 => encodeWav(8000, 1, nFrames, i => Seq(k(i, 0)))
      case 1 => encodeWav(8000, 2, nFrames, i => Seq(k(i, 0), k(i, 1)))
      case 2 => encodeWav(8000, 1, nFrames, i => Seq(
        ((id * 131 + i.toLong * 37) % 16777216L).toInt - 8388608), bits = 24)
      case _ => encodeWavFloat(8000, 1, nFrames,
        i => Seq(k(i, 0) / 32768f), extensible = true)
    }
  }

  // ---- JPEG (baseline DCT, ITU T.81, public spec) ------------------------

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** JPEG zigzag order: zigzag index → natural (row-major) index. */
  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical JPEG Huffman table in the classic
    * minCode/maxCode/valPtr decode form (T.81 §F.2.2.3). */
  private final class JpegHuff(counts: Array[Int], val symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  // T.81 Annex K.3 "typical" Huffman tables. An MJPEG frame may omit its
  // DHT segments (the OpenDML/MJPEG convention — the tables are implied);
  // decoders supply exactly these. Index 0 = luminance, 1 = chrominance.
  // A typo here cannot survive the spec's ImageIO cross-check: the JDK
  // encoder writes these same tables, and the strip-DHT fixture decodes
  // through ours alone.
  private lazy val AnnexKDc: Array[JpegHuff] = Array(
    new JpegHuff(Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      Array.tabulate(12)(_.toByte)),
    new JpegHuff(Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
      Array.tabulate(12)(_.toByte)))
  private lazy val AnnexKAc: Array[JpegHuff] = Array(
    new JpegHuff(Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
      Array(
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
        0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
        0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
        0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
        0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
        0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
        0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
        0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
        0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
        0xf9, 0xfa).map(_.toByte)),
    new JpegHuff(Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119),
      Array(
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
        0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
        0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
        0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
        0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
        0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
        0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
        0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
        0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
        0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
        0xf9, 0xfa).map(_.toByte)))

  /** The separable 8×8 inverse DCT basis: cos((2x+1)uπ/16) scaled by the
    * normalization (1/√2 for u = 0) and the 1/2 factor. */
  private val IdctCos: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = 0.5 * (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
        math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }

  /** Decode a BASELINE (and extended-sequential) Huffman JPEG to the
    * family's integer-BT.601 luma: marker walk (DQT 8/16-bit, DHT,
    * SOF0/1, DRI, SOS, APPn/COM skipped; T.81 B.1.1.2 fill bytes
    * allowed), 0xFF00 byte unstuffing, restart markers with predictor
    * resets, interleaved multi-component MCUs under arbitrary sampling
    * factors, a double-precision separable IDCT per block, and — for
    * color images — full chroma reconstruction: per-component planes,
    * nearest-neighbor chroma upsample, JFIF YCbCr→RGB with per-channel
    * clamping, then BT.601 of the clamped RGB, the same luma every
    * other codec here emits (VERDICT r13 item 6, the "extend" leg:
    * the prior luma-only decode diverged from reference decoders
    * exactly where RGB saturates). `None` — never a crash — for
    * progressive (SOF2) or arithmetic-coded images, non-8-bit
    * precision, truncated or structurally lying streams, and hostile
    * dimensions refused before allocation. Lossy format ⇒ no exact SQL
    * oracle; correctness is pinned by the bidirectional JDK ImageIO
    * cross-check (tolerance of a few luma steps, the decoder-to-decoder
    * variation — IDCT variants, fancy-vs-nearest upsampling — the spec
    * itself permits); the gate fixture [[encodeJpegFlat]] pins the
    * grayscale path value-for-value. */
  def decodeJpeg(payload: Array[Byte],
      implicitTables: Boolean = false): Option[DecodedImage] = {
    if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
        (payload(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcT = new Array[JpegHuff](4)
    val acT = new Array[JpegHuff](4)
    if (implicitTables) {
      // MJPEG frames may omit DHT: slots 0 (luma) and 1 (chroma) start at
      // the Annex K typical tables; in-stream DHT segments still override
      dcT(0) = AnnexKDc(0); dcT(1) = AnnexKDc(1)
      acT(0) = AnnexKAc(0); acT(1) = AnnexKAc(1)
    }
    var w = -1; var h = -1
    // per component: (id, hSamp, vSamp, qId); scan adds (dcId, acId)
    var comps: Array[Array[Int]] = null
    var dri = 0
    // progressive (SOF2) state: per-component NATURAL-order coefficient
    // grids that the multi-scan spectral-selection / successive-
    // approximation passes accumulate into; IDCT + assembly run at EOI
    var progressive = false
    var coefs: Array[Array[Int]] = null
    var sawScan = false
    var pos = 2
    while (pos + 2 <= payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
      // marker code — skip them instead of refusing (ADVICE r13)
      while (pos + 1 < payload.length && (payload(pos + 1) & 0xff) == 0xff)
        pos += 1
      if (pos + 2 > payload.length) return None
      val m = payload(pos + 1) & 0xff
      if (m == 0x00) return None // 0xFF00 is byte stuffing, not a marker
      if (m == 0xd9) { // EOI: a progressive image finishes here
        return if (progressive && sawScan)
          jpegProgFinish(w, h, comps, qt, coefs)
        else None // EOI before any (sequential) scan
      }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
      else {
        if (pos + 4 > payload.length) return None
        val len = be16(payload, pos + 2)
        if (len < 2 || pos + 2 + len > payload.length) return None
        val body = pos + 4
        val bend = pos + 2 + len
        m match {
          case 0xdb => // DQT: one or more (pq/tq, 64 entries) tables
            var p = body
            while (p < bend) {
              val pq = (payload(p) & 0xff) >> 4
              val tq = payload(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              p += 1
              val n = if (pq == 0) 64 else 128
              if (p + n > bend) return None
              var i = 0
              while (i < 64) {
                qt(tq)(JpegZigzag(i)) =
                  if (pq == 0) payload(p + i) & 0xff
                  else be16(payload, p + i * 2)
                i += 1
              }
              p += n
            }
          case 0xc4 => // DHT: one or more (tc/th, 16 counts, symbols)
            var p = body
            while (p < bend) {
              val tc = (payload(p) & 0xff) >> 4
              val th = payload(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > bend) return None
              val counts = Array.tabulate(16)(i => payload(p + 1 + i) & 0xff)
              val total = counts.sum
              if (total > 256 || p + 17 + total > bend) return None
              val syms = java.util.Arrays.copyOfRange(payload, p + 17,
                p + 17 + total)
              val t = new JpegHuff(counts, syms)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1/2: sequential / progressive
            if (comps != null) return None // a second frame header lies
            if (body + 6 > bend || (payload(body) & 0xff) != 8) return None
            h = be16(payload, body + 1); w = be16(payload, body + 3)
            val n = payload(body + 5) & 0xff
            if (w <= 0 || h <= 0 || (n != 1 && n != 3) ||
                body + 6 + 3 * n > bend) return None
            if (w.toLong * h > Int.MaxValue) return None
            comps = Array.tabulate(n) { i =>
              val o = body + 6 + 3 * i
              val samp = payload(o + 1) & 0xff
              Array(payload(o) & 0xff, samp >> 4, samp & 0x0f,
                payload(o + 2) & 0xff, 0, 0)
            }
            if (comps.exists(c => c(1) < 1 || c(1) > 4 || c(2) < 1 ||
                c(2) > 4 || c(3) > 3)) return None
            if (m == 0xc2) {
              progressive = true
              // allocate the per-component coefficient grids on the
              // interleaved (padded) geometry — a superset of every
              // scan's block range; hostile dims refused BEFORE any
              // allocation, the standing codec rule
              val oneComp = n == 1
              val maxH = comps.map(_(1)).max
              val maxV = comps.map(_(2)).max
              val mcusX = (w + (if (oneComp) 8 else 8 * maxH) - 1) /
                (if (oneComp) 8 else 8 * maxH)
              val mcusY = (h + (if (oneComp) 8 else 8 * maxV) - 1) /
                (if (oneComp) 8 else 8 * maxV)
              coefs = new Array[Array[Int]](n)
              var ci = 0
              while (ci < n) {
                val bw = mcusX.toLong * (if (oneComp) 1 else comps(ci)(1))
                val bh2 = mcusY.toLong * (if (oneComp) 1 else comps(ci)(2))
                if (bw * bh2 * 64 > Int.MaxValue) return None
                coefs(ci) = new Array[Int]((bw * bh2 * 64).toInt)
                ci += 1
              }
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // lossless/arithmetic/hierarchical: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            dri = be16(payload, body)
          case 0xda if !progressive => // SOS: bind tables, then decode
            if (comps == null) return None
            val n = payload(body) & 0xff
            if (n != comps.length || body + 1 + 2 * n + 3 > bend) return None
            var i = 0
            while (i < n) {
              val cid = payload(body + 1 + 2 * i) & 0xff
              val tb = payload(body + 2 + 2 * i) & 0xff
              val c = comps.find(_(0) == cid).getOrElse(return None)
              c(4) = tb >> 4; c(5) = tb & 0x0f
              if (c(4) > 3 || c(5) > 3 || dcT(c(4)) == null ||
                  acT(c(5)) == null) return None
              i += 1
            }
            return jpegScan(payload, bend, w, h, comps, qt, dcT, acT, dri)
          case 0xda => // progressive SOS: accumulate one scan, continue
            if (comps == null) return None
            val n = payload(body) & 0xff
            if (n < 1 || n > comps.length ||
                body + 1 + 2 * n + 3 > bend) return None
            val scanComps = new Array[Int](n)
            var i = 0
            while (i < n) {
              val cid = payload(body + 1 + 2 * i) & 0xff
              val tb = payload(body + 2 + 2 * i) & 0xff
              val idx = comps.indexWhere(_(0) == cid)
              if (idx < 0) return None
              val c = comps(idx)
              c(4) = tb >> 4; c(5) = tb & 0x0f
              if (c(4) > 3 || c(5) > 3) return None
              scanComps(i) = idx
              i += 1
            }
            val ss = payload(body + 1 + 2 * n) & 0xff
            val se = payload(body + 2 + 2 * n) & 0xff
            val ahal = payload(body + 3 + 2 * n) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            // spectral/approximation legality (T.81 B.2.3): DC scans are
            // Ss = Se = 0 (the only scans that may interleave); AC scans
            // are single-component with 1 <= Ss <= Se <= 63; point
            // transforms stay in [0, 13]
            if (ss == 0) { if (se != 0) return None }
            else if (n != 1 || se < ss || se > 63) return None
            if (ah > 13 || al > 13) return None
            // table presence, only for the tables this scan reads (a DC
            // refinement scan reads none)
            if (ss == 0 && ah == 0 &&
                scanComps.exists(ci => dcT(comps(ci)(4)) == null)) return None
            if (ss > 0 && acT(comps(scanComps(0))(5)) == null) return None
            val np = jpegProgScan(payload, bend, comps, scanComps, dcT, acT,
              coefs, w, h, ss, se, ah, al, dri)
            if (np < 0) return None
            sawScan = true
            pos = np
          case _ => () // APPn, COM, others: skipped
        }
        if (m != 0xda || !progressive) pos += 2 + len
      }
    }
    None
  }

  /** Entropy-decode the single interleaved scan and IDCT the luma. */
  private def jpegScan(payload: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Array[Int]], qt: Array[Array[Int]],
      dcT: Array[JpegHuff], acT: Array[JpegHuff],
      dri: Int): Option[DecodedImage] = {
    val maxH = comps.map(_(1)).max
    val maxV = comps.map(_(2)).max
    // single-component scans are NOT interleaved (T.81 A.2.2): the MCU
    // is one block, whatever the declared sampling factors
    val oneComp = comps.length == 1
    val mcuW = if (oneComp) 8 else 8 * maxH
    val mcuH = if (oneComp) 8 else 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // one padded plane PER COMPONENT, each in its own subsampled grid:
    // component ci contributes bh×bv blocks per MCU, so its plane is
    // (mcusX·bh·8) × (mcusY·bv·8) — chroma planes are smaller than luma
    // under 4:2:0/4:2:2 and upsample at the combine step below
    val nC = comps.length
    val bhOf = Array.tabulate(nC)(i => if (oneComp) 1 else comps(i)(1))
    val bvOf = Array.tabulate(nC)(i => if (oneComp) 1 else comps(i)(2))
    val planeWOf = Array.tabulate(nC)(i => mcusX * bhOf(i) * 8)
    val planeHOf = Array.tabulate(nC)(i => mcusY * bvOf(i) * 8)
    var pi = 0
    while (pi < nC) {
      if (planeWOf(pi).toLong * planeHOf(pi) > Int.MaxValue) return None
      pi += 1
    }
    val planes = Array.tabulate(nC)(i =>
      new Array[Int](planeWOf(i) * planeHOf(i)))
    var pos = start
    var bitBuf = 0; var bitCnt = 0
    var hitMarker = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (hitMarker || pos >= payload.length) return -1
        var v = payload(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= payload.length) return -1
          if ((payload(pos) & 0xff) == 0) pos += 1
          else { hitMarker = true; return -1 }
        }
        bitBuf = v; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def decodeHuff(t: JpegHuff): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val b = nextBit(); if (b < 0) return -1
        code = (code << 1) | b
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l)) & 0xff
        l += 1
      }
      -1
    }
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0; var i = 0
      while (i < s) {
        val b = nextBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    // decode one block of component ci; IDCT into ITS plane at (px, py)
    def block(ci: Int, px: Int, py: Int): Boolean = {
      val c = comps(ci)
      val q = qt(c(3))
      java.util.Arrays.fill(coef, 0)
      val t = decodeHuff(dcT(c(4))); if (t < 0 || t > 15) return false
      val diff = receiveExtend(t); if (diff == Int.MinValue) return false
      preds(ci) += diff
      coef(0) = preds(ci) * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeHuff(acT(c(5))); if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 else eob = true
        } else {
          k += r
          if (k > 63) return false
          val v = receiveExtend(s); if (v == Int.MinValue) return false
          val n = JpegZigzag(k); coef(n) = v * q(n)
          k += 1
        }
      }
      jpegIdct(coef, tmp, planes(ci), planeWOf(ci), planeHOf(ci), px, py)
      true
    }
    val nMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        // restart: byte-align, expect RSTn, reset the DC predictors
        bitCnt = 0
        if (hitMarker) {
          // nextBit consumed the 0xFF and stopped AT the marker byte;
          // further 0xFFs there are fill bytes (T.81 B.1.1.2)
          while (pos < payload.length && (payload(pos) & 0xff) == 0xff)
            pos += 1
          if (pos >= payload.length) return None
          val mk = payload(pos) & 0xff
          if (mk < 0xd0 || mk > 0xd7) return None
          pos += 1; hitMarker = false
        } else {
          if (pos + 2 > payload.length ||
              (payload(pos) & 0xff) != 0xff) return None
          while (pos + 1 < payload.length &&
              (payload(pos + 1) & 0xff) == 0xff)
            pos += 1
          if (pos + 2 > payload.length) return None
          val mk = payload(pos + 1) & 0xff
          if (mk < 0xd0 || mk > 0xd7) return None
          pos += 2
        }
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val bh = bhOf(ci)
        val bv = bvOf(ci)
        var by = 0
        while (by < bv) {
          var bx = 0
          while (bx < bh) {
            val px = (mx * bh + bx) * 8
            val py = (my * bv + by) * 8
            if (!block(ci, px, py)) return None
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    jpegAssemble(w, h, maxH, maxV, planes, planeWOf, bhOf, bvOf)
  }

  /** The separable 8×8 inverse DCT of one block of NATURAL-order,
    * already-dequantized coefficients, level-shifted +128, clamped, and
    * written into `plane` at (px, py) — shared by the sequential and
    * progressive finish paths. */
  private def jpegIdct(coef: Array[Int], tmp: Array[Double],
      plane: Array[Int], planeW: Int, planeH: Int, px: Int, py: Int): Unit = {
    // rows: tmp = coef × basis over u (per row), then columns
    var yy = 0
    while (yy < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += coef(yy * 8 + u) * IdctCos(u * 8 + x); u += 1 }
        tmp(yy * 8 + x) = acc
        x += 1
      }
      yy += 1
    }
    var x = 0
    while (x < 8) {
      var yo = 0
      while (yo < 8) {
        var acc = 0.0; var v = 0
        while (v < 8) { acc += tmp(v * 8 + x) * IdctCos(v * 8 + yo); v += 1 }
        val px2 = px + x; val py2 = py + yo
        if (px2 < planeW && py2 < planeH) {
          val s2 = math.round(acc + 128.0).toInt
          plane(py2 * planeW + px2) =
            if (s2 < 0) 0 else if (s2 > 255) 255 else s2
        }
        yo += 1
      }
      x += 1
    }
  }

  /** Assemble decoded component planes into the family's integer BT.601
    * luma — shared by the sequential and progressive paths. Grayscale
    * crops the padded plane; color runs chroma upsample
    * (libjpeg-compatible triangle filter for the h2v1/h2v2 web cases,
    * replication otherwise — see [[jpegUpsample]]) + JFIF YCbCr→RGB with
    * per-channel clamping, then BT.601 of the clamped RGB. Off the
    * clamp, BT.601 of (R,G,B) reproduces Y exactly (the conversion is
    * its own inverse in the luma direction), so this differs from the
    * coded Y only where RGB saturates — which is precisely where a
    * luma-only decode diverged from reference decoders (they clamp in
    * RGB space). */
  private def jpegAssemble(w: Int, h: Int, maxH: Int, maxV: Int,
      planes: Array[Array[Int]], planeWOf: Array[Int],
      bhOf: Array[Int], bvOf: Array[Int]): Option[DecodedImage] = {
    val luma = new Array[Int](w * h)
    if (planes.length == 1) {
      // grayscale: crop the padded plane to the declared dims
      val plane = planes(0); val planeW = planeWOf(0)
      var yy = 0
      while (yy < h) {
        System.arraycopy(plane, yy * planeW, luma, yy * w, w)
        yy += 1
      }
    } else {
      val pY = planes(0); val wY = planeWOf(0)
      val cb = jpegUpsample(planes(1), planeWOf(1), bhOf(1), bvOf(1),
        maxH, maxV, w, h)
      val cr = jpegUpsample(planes(2), planeWOf(2), bhOf(2), bvOf(2),
        maxH, maxV, w, h)
      if (cb == null || cr == null) return None // non-integer ratio
      def clamp(d: Double): Int = {
        val v = math.round(d).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      var yy = 0
      while (yy < h) {
        var x = 0
        while (x < w) {
          val p = yy * w + x
          val yv = pY(yy * wY + x)
          val cbv = cb(p) - 128
          val crv = cr(p) - 128
          val r = clamp(yv + 1.402 * crv)
          val g = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
          val b = clamp(yv + 1.772 * cbv)
          luma(p) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        yy += 1
      }
    }
    Some(DecodedImage(w, h, luma))
  }

  /** Entropy-coded-segment bit reader for the progressive scans: 0xFF00
    * unstuffing, marker detection, restart-marker consumption (with T.81
    * fill bytes), and locating the next marker after a scan's last
    * decoded unit. The sequential path keeps its inlined twin. */
  private final class JpegBits(payload: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    private var hitMarker = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (hitMarker || pos >= payload.length) return -1
        val v = payload(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= payload.length) return -1
          if ((payload(pos) & 0xff) == 0) pos += 1
          else { hitMarker = true; return -1 }
        }
        bitBuf = v; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def decodeHuff(t: JpegHuff): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        val b = nextBit(); if (b < 0) return -1
        code = (code << 1) | b
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l)) & 0xff
        l += 1
      }
      -1
    }
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0; var i = 0
      while (i < s) {
        val b = nextBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    /** `n` unsigned bits; −1 on truncation. */
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = nextBit(); if (b < 0) return -1
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Byte-align and consume one RSTn marker (fill bytes allowed). */
    def restart(): Boolean = {
      bitCnt = 0
      if (hitMarker) {
        while (pos < payload.length && (payload(pos) & 0xff) == 0xff)
          pos += 1
        if (pos >= payload.length) return false
        val mk = payload(pos) & 0xff
        if (mk < 0xd0 || mk > 0xd7) return false
        pos += 1; hitMarker = false
      } else {
        if (pos + 2 > payload.length ||
            (payload(pos) & 0xff) != 0xff) return false
        while (pos + 1 < payload.length && (payload(pos + 1) & 0xff) == 0xff)
          pos += 1
        if (pos + 2 > payload.length) return false
        val mk = payload(pos + 1) & 0xff
        if (mk < 0xd0 || mk > 0xd7) return false
        pos += 2
      }
      true
    }
    /** Position of the next marker's leading 0xFF after the scan's
      * entropy data (skipping stuffed 0xFF00 pairs); −1 if none. */
    def nextMarkerPos(): Int = {
      if (hitMarker) return pos - 1 // nextBit stopped AT the marker code
      var p = pos
      while (p + 1 < payload.length) {
        if ((payload(p) & 0xff) != 0xff) p += 1
        else if ((payload(p + 1) & 0xff) == 0) p += 2 // stuffing
        else return p
      }
      -1
    }
  }

  /** Decode ONE progressive scan (T.81 Annex G spectral selection +
    * successive approximation; the published IJG decoder algorithm,
    * reimplemented) into the per-component coefficient grids. Returns
    * the payload position of the next marker's 0xFF, or −1 to refuse.
    * DC scans (Ss = 0) may interleave and carry the per-component
    * predictors; AC scans are single-component in the component's OWN
    * ceil-dims block raster. Restart markers reset predictors AND the
    * EOB run. */
  private def jpegProgScan(payload: Array[Byte], start: Int,
      comps: Array[Array[Int]], scanComps: Array[Int],
      dcT: Array[JpegHuff], acT: Array[JpegHuff],
      coefs: Array[Array[Int]], w: Int, h: Int,
      ss: Int, se: Int, ah: Int, al: Int, dri: Int): Int = {
    val oneComp = comps.length == 1
    val maxH = comps.map(_(1)).max
    val maxV = comps.map(_(2)).max
    val mcuW = if (oneComp) 8 else 8 * maxH
    val mcuH = if (oneComp) 8 else 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    def bhOf(ci: Int) = if (oneComp) 1 else comps(ci)(1)
    def bvOf(ci: Int) = if (oneComp) 1 else comps(ci)(2)
    def blocksW(ci: Int) = mcusX * bhOf(ci)
    val bits = new JpegBits(payload, start)
    val preds = new Array[Int](comps.length)
    var eobrun = 0
    def dcFirst(ci: Int, off: Int): Boolean = {
      val t = bits.decodeHuff(dcT(comps(ci)(4)))
      if (t < 0 || t > 15) return false
      val diff = bits.receiveExtend(t)
      if (diff == Int.MinValue) return false
      preds(ci) += diff
      coefs(ci)(off) = preds(ci) << al
      true
    }
    def dcRefine(ci: Int, off: Int): Boolean = {
      val b = bits.nextBit(); if (b < 0) return false
      if (b == 1) coefs(ci)(off) |= 1 << al
      true
    }
    def acFirst(ci: Int, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val co = coefs(ci)
      val t = acT(comps(ci)(5))
      var k = ss
      while (k <= se) {
        val rs = bits.decodeHuff(t); if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else { // EOBn: this block ends; the next 2^r-1 + ext also end
            eobrun = (1 << r) - 1
            if (r > 0) {
              val ex = bits.receive(r); if (ex < 0) return false
              eobrun += ex
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val v = bits.receiveExtend(s)
          if (v == Int.MinValue) return false
          co(off + JpegZigzag(k)) = v << al
          k += 1
        }
      }
      true
    }
    def acRefine(ci: Int, off: Int): Boolean = {
      val co = coefs(ci)
      val t = acT(comps(ci)(5))
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = bits.decodeHuff(t); if (rs < 0) return false
          var r = rs >> 4; val s = rs & 15
          var newVal = 0
          if (s != 0) {
            if (s != 1) return false // refinement codes only carry ±1
            val b = bits.nextBit(); if (b < 0) return false
            newVal = if (b == 1) p1 else m1
          } else if (r != 15) { // EOBn: corrections-only tail below
            eobrun = 1 << r
            if (r > 0) {
              val ex = bits.receive(r); if (ex < 0) return false
              eobrun += ex
            }
            ended = true
          } // r == 15, s == 0: ZRL — skip 16 zero-history coefficients
          if (!ended) {
            // advance over r zero-history coefficients, emitting a
            // correction bit for every nonzero-history one passed, then
            // place the new ±1 (if any) at the stopping zero
            var placed = false
            while (k <= se && !placed) {
              val z = off + JpegZigzag(k)
              if (co(z) != 0) {
                val b = bits.nextBit(); if (b < 0) return false
                if (b == 1 && (co(z) & p1) == 0)
                  co(z) += (if (co(z) >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newVal != 0) co(z) = newVal
                  placed = true
                } else r -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // run past Se: lies
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run only correction bits for already-nonzero
        // coefficients are coded
        while (k <= se) {
          val z = off + JpegZigzag(k)
          if (co(z) != 0) {
            val b = bits.nextBit(); if (b < 0) return false
            if (b == 1 && (co(z) & p1) == 0)
              co(z) += (if (co(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }
    def unit(ci: Int, off: Int): Boolean =
      if (ss == 0) { if (ah == 0) dcFirst(ci, off) else dcRefine(ci, off) }
      else { if (ah == 0) acFirst(ci, off) else acRefine(ci, off) }
    val interleaved = scanComps.length > 1
    // non-interleaved scans walk the component's OWN ceil-dims raster
    // (T.81 A.2.2), a subset of the padded storage grid
    val (bw1, bh1) =
      if (interleaved) (0, 0)
      else {
        val ci = scanComps(0)
        if (oneComp) ((w + 7) / 8, (h + 7) / 8)
        else (((w * bhOf(ci) + maxH - 1) / maxH + 7) / 8,
          ((h * bvOf(ci) + maxV - 1) / maxV + 7) / 8)
      }
    val nUnits = if (interleaved) mcusX * mcusY else bw1 * bh1
    var u = 0
    while (u < nUnits) {
      if (dri > 0 && u > 0 && u % dri == 0) {
        if (!bits.restart()) return -1
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }
      if (interleaved) {
        val mx = u % mcusX; val my = u / mcusX
        var sci = 0
        while (sci < scanComps.length) {
          val ci = scanComps(sci)
          val bh = bhOf(ci); val bv = bvOf(ci)
          var by = 0
          while (by < bv) {
            var bx = 0
            while (bx < bh) {
              val off = ((my * bv + by) * blocksW(ci) + (mx * bh + bx)) * 64
              if (!unit(ci, off)) return -1
              bx += 1
            }
            by += 1
          }
          sci += 1
        }
      } else {
        val ci = scanComps(0)
        val off = ((u / bw1) * blocksW(ci) + (u % bw1)) * 64
        if (!unit(ci, off)) return -1
      }
      u += 1
    }
    bits.nextMarkerPos()
  }

  /** Dequantize + IDCT the accumulated progressive coefficient grids
    * into per-component planes and assemble the family luma — the
    * progressive twin of [[jpegScan]]'s streaming finish. */
  private def jpegProgFinish(w: Int, h: Int, comps: Array[Array[Int]],
      qt: Array[Array[Int]],
      coefs: Array[Array[Int]]): Option[DecodedImage] = {
    val nC = comps.length
    val oneComp = nC == 1
    val maxH = comps.map(_(1)).max
    val maxV = comps.map(_(2)).max
    val mcuW = if (oneComp) 8 else 8 * maxH
    val mcuH = if (oneComp) 8 else 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val bhOf = Array.tabulate(nC)(i => if (oneComp) 1 else comps(i)(1))
    val bvOf = Array.tabulate(nC)(i => if (oneComp) 1 else comps(i)(2))
    val planeWOf = Array.tabulate(nC)(i => mcusX * bhOf(i) * 8)
    val planeHOf = Array.tabulate(nC)(i => mcusY * bvOf(i) * 8)
    val planes = Array.tabulate(nC)(i =>
      new Array[Int](planeWOf(i) * planeHOf(i)))
    val coefBuf = new Array[Int](64)
    val tmp = new Array[Double](64)
    var ci = 0
    while (ci < nC) {
      val q = qt(comps(ci)(3))
      val co = coefs(ci)
      val bw = mcusX * bhOf(ci)
      val bh2 = mcusY * bvOf(ci)
      var bY = 0
      while (bY < bh2) {
        var bX = 0
        while (bX < bw) {
          val off = (bY * bw + bX) * 64
          var i = 0
          while (i < 64) { coefBuf(i) = co(off + i) * q(i); i += 1 }
          jpegIdct(coefBuf, tmp, planes(ci), planeWOf(ci), planeHOf(ci),
            bX * 8, bY * 8)
          bX += 1
        }
        bY += 1
      }
      ci += 1
    }
    jpegAssemble(w, h, maxH, maxV, planes, planeWOf, bhOf, bvOf)
  }

  /** Upsample one chroma plane (stride `stride`, meaningful region
    * ceil(w·ch/maxH) × ceil(h·cv/maxV)) to a full w×h array. The 2×1 and
    * 2×2 expansions use the IJG "fancy" triangle filter (jdsample.c's
    * h2v1/h2v2 arithmetic, including its +1/+2 and +7/+8 rounding biases
    * and edge replication) — the de-facto web-decoder behavior the JDK
    * inherits, which a cross-checked decode must reproduce or diverge on
    * every noisy image; other integer ratios replicate (libjpeg's own
    * fallback). Null for non-integer sampling ratios (spec-legal but
    * pathological; the caller refuses the image). */
  private def jpegUpsample(plane: Array[Int], stride: Int, ch: Int, cv: Int,
      maxH: Int, maxV: Int, w: Int, h: Int): Array[Int] = {
    if (maxH % ch != 0 || maxV % cv != 0) return null
    val rh = maxH / ch; val rv = maxV / cv
    val cw = (w + rh - 1) / rh
    val chh = (h + rv - 1) / rv
    def src(x: Int, y: Int): Int = {
      val xx = if (x < 0) 0 else if (x >= cw) cw - 1 else x
      val yy = if (y < 0) 0 else if (y >= chh) chh - 1 else y
      plane(yy * stride + xx)
    }
    val out = new Array[Int](w * h)
    if (rh == 1 && rv == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = src(x, y); x += 1 }
        y += 1
      }
    } else if (rh == 2 && rv == 1) {
      // IJG h2v1_fancy: 3:1 horizontal triangle, edges replicated
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = x >> 1
          val v =
            if (i == 0 && (x & 1) == 0) src(0, y)
            else if (i == cw - 1 && (x & 1) == 1) src(cw - 1, y)
            else if ((x & 1) == 0) (src(i, y) * 3 + src(i - 1, y) + 1) >> 2
            else (src(i, y) * 3 + src(i + 1, y) + 2) >> 2
          out(y * w + x) = v
          x += 1
        }
        y += 1
      }
    } else if (rh == 2 && rv == 2) {
      // IJG h2v2_fancy: 3:1 vertical pre-sum, then 3:1 horizontal with
      // the 8/7 rounding biases; first/last columns use the 4× form
      var y = 0
      while (y < h) {
        val cy = y >> 1
        val other = if ((y & 1) == 0) cy - 1 else cy + 1
        def colsum(i: Int): Int = src(i, cy) * 3 + src(i, other)
        var x = 0
        while (x < w) {
          val i = x >> 1
          val v =
            if (i == 0 && (x & 1) == 0) (colsum(0) * 4 + 8) >> 4
            else if (i == cw - 1 && (x & 1) == 1) (colsum(cw - 1) * 4 + 7) >> 4
            else if ((x & 1) == 0) (colsum(i) * 3 + colsum(i - 1) + 8) >> 4
            else (colsum(i) * 3 + colsum(i + 1) + 7) >> 4
          out(y * w + x) = v
          x += 1
        }
        y += 1
      }
    } else {
      // other integer ratios: replication, libjpeg's own fallback
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = src(x / rh, y / rv); x += 1 }
        y += 1
      }
    }
    out
  }

  /** Encode a flat-tile grayscale image as a LOSSLESS-by-construction
    * baseline JPEG: every 8×8 block is the constant `tile(bx, by)` ∈
    * [0, 255], the quant table is all-ones, so each block codes as a
    * single DC coefficient F(0,0) = 8·(g − 128) whose IDCT reproduces g
    * EXACTLY — the one corner of a lossy format an exact SQL oracle can
    * replay (the gate fixture role [[encodeGif]] plays for LZW). Emits
    * the Annex K.3.1 DC table, a 1-symbol AC table (EOB only), and —
    * with `dri` > 0 — real RST0..7 restart markers with predictor
    * resets every `dri` MCUs, the path no JDK fixture can reach
    * (ImageIO exposes no DRI knob). `width`/`height` need not be block
    * multiples: edge blocks encode whole and the decoder crops. */
  def encodeJpegFlat(width: Int, height: Int, tile: (Int, Int) => Int,
      dri: Int = 0, progressive: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    def b16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def seg(marker: Int)(body: => Unit): Unit = {
      out.write(0xff); out.write(marker)
      val lenAt = out.size(); b16(0)
      body
      val bytes = out.toByteArray
      val len = bytes.length - lenAt
      bytes(lenAt) = ((len >> 8) & 0xff).toByte
      bytes(lenAt + 1) = (len & 0xff).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb) { out.write(0); (0 until 64).foreach(_ => out.write(1)) }
    // SOF0 sequential or SOF2 progressive: 8-bit, 1 component, 1×1, q0
    seg(if (progressive) 0xc2 else 0xc0) {
      out.write(8); b16(height); b16(width); out.write(1)
      out.write(1); out.write(0x11); out.write(0)
    }
    // DC table 0: Annex K.3.1 (counts 0,1,5,1,1,1,1,1,1,0…; symbols 0–11)
    seg(0xc4) {
      out.write(0x00)
      Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
      (0 to 11).foreach(out.write)
    }
    // AC table 0: ONE symbol (EOB = 0x00) at code length 4 → code 0000
    seg(0xc4) {
      out.write(0x10)
      Seq(0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
      out.write(0x00)
    }
    if (dri > 0) seg(0xdd) { b16(dri) }
    // K.3.1 canonical DC codes: cat 0 → 00 (2 bits); 1–5 → 010…110
    // (3 bits); 6+ → 1110…, one leading 1 per extra category
    def dcCode(cat: Int): (Int, Int) =
      if (cat == 0) (0, 2)
      else if (cat <= 5) (1 + cat, 3)
      else ((1 << (cat - 2)) - 2, cat - 2)
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1); bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def flushBits(): Unit =
      if (bitCnt > 0) putBits((1 << (8 - bitCnt)) - 1, 8 - bitCnt)
    var pred = 0
    // one entropy-coded scan over all blocks in raster order, restart
    // markers every `dri` units (with the DC-predictor reset the decoder
    // must mirror), per-block payload from `emit`
    def scanBody(emit: (Int, Int) => Unit): Unit = {
      var rst = 0; var mcu = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (dri > 0 && mcu > 0 && mcu % dri == 0) {
            flushBits()
            out.write(0xff); out.write(0xd0 + (rst % 8)); rst += 1
            pred = 0
          }
          emit(bx, by)
          mcu += 1
          bx += 1
        }
        by += 1
      }
      flushBits()
    }
    def emitDc(bx: Int, by: Int): Unit = {
      val g = tile(bx, by)
      require(g >= 0 && g <= 255, s"tile($bx,$by)=$g out of [0,255]")
      val dc = 8 * (g - 128)
      val diff = dc - pred; pred = dc
      val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCode(cat)
      putBits(code, len)
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
    }
    def sos(ss: Int, se: Int): Unit = seg(0xda) {
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write(0)
    }
    if (!progressive) {
      sos(0, 63)
      scanBody { (bx, by) =>
        emitDc(bx, by)
        putBits(0, 4) // EOB: the 1-symbol AC table's code 0000
      }
    } else {
      // scan 1: DC, spectral 0..0, no point transform — flat tiles are
      // DC-only, so this scan already carries the whole image; restart
      // markers exercise the progressive predictor-reset path
      sos(0, 0)
      scanBody(emitDc)
      // scan 2: AC, spectral 1..63 — every block is one EOB0 (all ACs
      // zero), exercising the EOB-run machinery and per-scan restarts
      pred = 0
      sos(1, 63)
      scanBody((_, _) => putBits(0, 4))
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** [[synthBmp]]'s JPEG twin: per-8×8-block-constant luma from a
    * small-prime map of (id, blockX, blockY) — flat blocks are the exact
    * corner of the lossy format ([[encodeJpegFlat]]), so the gate oracle
    * replays luma(x, y) = tile(x/8, y/8) arithmetically while the Spark
    * side pays the real marker walk, Huffman decode, restart markers
    * (dri = 2 puts the RST path behind the hash gate, not just a spec),
    * IDCT, and partial-MCU crop. The JPEG docs alternate BASELINE and
    * PROGRESSIVE encodings by id (the flat tiles decode identically
    * either way), so the multi-scan spectral-selection path sits behind
    * the same hash gate. */
  def synthJpeg(id: Long, width: Int = 15, height: Int = 17): Array[Byte] =
    encodeJpegFlat(width, height,
      (bx, by) => ((id * 7 + bx * 31 + by * 59) % 256).toInt, dri = 2,
      progressive = id % 12 == 11)

  // ---- AVI (RIFF container, uncompressed DIB or MJPEG frames) -----------

  /** A decoded AVI's geometry, codec, and the payload offsets/sizes of
    * its video frames — frames decode lazily via [[frameLuma]] so a
    * sampler never materializes the frames it skips. */
  final case class DecodedVideo(width: Int, height: Int, mjpeg: Boolean,
      frameOffsets: Array[Int], frameSizes: Array[Int])

  /** 'MJPG' as the little-endian biCompression fourcc. */
  private val FourccMjpg =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Parse a RIFF/AVI container holding EXACTLY ONE video stream —
    * uncompressed 24-bit DIB (BI_RGB '##db' frames, the layout
    * [[decodeBmp]] reads) or MJPEG ('MJPG' fourcc, '##dc' frames each a
    * baseline JPEG for [[decodeJpeg]]): `hdrl` walk for the main
    * header's dimensions and the ORDERED `strl` stream list (stream N's
    * frame chunks are the ones whose id leads with N's two digits —
    * frames bind to the stream whose `strf` validated, never
    * interleaved across streams; more than one video `strl` refuses,
    * ADVICE r13), `strf` BITMAPINFOHEADER verification, `movi` walk for
    * the frame chunk offsets. For DIB, frames smaller than one
    * rowSize×height raster are refused here so [[aviFrameLuma]] reads
    * without further bounds checks; MJPEG frames carry their sizes and
    * decode-or-None per frame in [[frameLuma]]. Other compressions, bit
    * depths, hostile dimensions, and truncated/lying chunk sizes decode
    * to None — the standing codec contract. */
  def decodeAvi(payload: Array[Byte]): Option[DecodedVideo] = {
    if (payload.length < 24 || payload(0) != 'R' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'A' ||
        payload(9) != 'V' || payload(10) != 'I' || payload(11) != ' ')
      return None
    var width = -1; var height = -1
    var nStrl = 0 // strl lists in document order = AVI stream numbers
    var nVids = 0
    var vidsStream = -1 // the strl index whose strh declared 'vids'
    // strl index -> validated video format (false = DIB, true = MJPEG)
    val fmtOf = scala.collection.mutable.HashMap.empty[Int, Boolean]
    // (stream, offset, size) of every frame chunk in the movi walk
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // (start, end, strlIdx) spans to walk; LIST bodies push a nested
    // span — strl spans carry their document-order stream index
    var spans = List((12L, payload.length.toLong, -1))
    while (spans.nonEmpty) {
      var (pos, end, strlIdx) = spans.head
      spans = spans.tail
      while (pos + 8 <= end) {
        val p = pos.toInt
        val id = new String(payload, p, 4, "US-ASCII")
        val size = le32(payload, p + 4).toLong & 0xffffffffL
        val body = pos + 8
        if (body + size > end) return None // lying chunk size
        id match {
          case "LIST" =>
            if (size < 4) return None
            val kind = new String(payload, body.toInt, 4, "US-ASCII")
            // the lists on the video path are walked, including the
            // 'rec ' interleave wrappers VfW writers nest inside movi
            // (frame chunks live INSIDE them in an interleaved AVI);
            // others (odml, INFO) stay opaque
            if (kind == "hdrl" || kind == "movi" || kind == "rec ")
              spans = ((body + 4, body + size, -1)) :: spans
            else if (kind == "strl") {
              spans = ((body + 4, body + size, nStrl)) :: spans
              nStrl += 1
            }
          case "avih" =>
            if (size < 40) return None
            width = le32(payload, body.toInt + 32)
            height = le32(payload, body.toInt + 36)
          case "strh" if strlIdx >= 0 =>
            if (size < 4) return None
            val fcc = new String(payload, body.toInt, 4, "US-ASCII")
            if (fcc == "vids") {
              nVids += 1
              vidsStream = strlIdx
            }
          case "strf" if strlIdx >= 0 =>
            // BITMAPINFOHEADER: biCompression @16 (0 = BI_RGB, 'MJPG'),
            // biBitCount @14 — a WAVEFORMATEX here is smaller than 40
            // bytes and simply doesn't validate its strl
            if (size >= 40 && le16(payload, body.toInt + 14) == 24) {
              val compression = le32(payload, body.toInt + 16)
              if (compression == 0) fmtOf(strlIdx) = false
              else if (compression == FourccMjpg) fmtOf(strlIdx) = true
            }
          case _ =>
            // frame chunks: two stream-number digits + db/dc suffix
            if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
                (id.endsWith("db") || id.endsWith("dc")) &&
                size <= Int.MaxValue)
              frames += (((id(0) - '0') * 10 + (id(1) - '0'),
                body.toInt, size.toInt))
        }
        pos = body + size + (size & 1L) // RIFF chunks are even-padded
      }
    }
    if (width <= 0 || height <= 0) return None
    // exactly one video stream, and its strf must have validated — a
    // multi-video container would otherwise interleave frames from
    // different streams into one structurally-coherent but semantically
    // mixed sequence (ADVICE r13)
    if (nVids != 1 || !fmtOf.contains(vidsStream)) return None
    val mjpeg = fmtOf(vidsStream)
    // sort by file offset: the span stack walks nested 'rec ' lists
    // LIFO, but a frame's temporal order IS its document order
    val mine = frames.filter(_._1 == vidsStream).sortBy(_._2)
    if (mine.isEmpty) return None
    if (width.toLong * height > Int.MaxValue) return None
    if (!mjpeg) {
      val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4
      val raster = rowSizeL * height
      if (raster > Int.MaxValue) return None
      // every DIB frame chunk must hold a full raster (verified ONCE)
      val ok = mine.forall { case (_, off, size) =>
        size >= raster && off + raster <= payload.length
      }
      if (!ok) return None
    }
    Some(DecodedVideo(width, height, mjpeg,
      mine.map(_._2).toArray, mine.map(_._3).toArray))
  }

  /** Decode frame `f` of a [[decodeAvi]]-verified container: DIB frames
    * via [[aviFrameLuma]] (bounds pre-verified, always Some), MJPEG
    * frames via [[decodeJpeg]] over the chunk slice — None when the
    * embedded JPEG is undecodable or its dims lie about the container's
    * (decode-or-None per frame, never a crash). */
  def frameLuma(payload: Array[Byte], v: DecodedVideo,
      f: Int): Option[Array[Int]] =
    if (!v.mjpeg)
      Some(aviFrameLuma(payload, v.frameOffsets(f), v.width, v.height))
    else
      decodeJpeg(java.util.Arrays.copyOfRange(payload, v.frameOffsets(f),
          v.frameOffsets(f) + v.frameSizes(f)), implicitTables = true)
        .filter(img => img.width == v.width && img.height == v.height)
        .map(_.luma)

  /** Decode ONE frame of a [[decodeAvi]]-verified container to top-down
    * luma: bottom-up BI_RGB rows with 4-byte padding, [[decodeBmp]]'s
    * exact arithmetic. Bounds were verified by decodeAvi. */
  def aviFrameLuma(payload: Array[Byte], off: Int, width: Int,
      height: Int): Array[Int] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val src = off + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val b = payload(src + x * 3) & 0xff
        val g = payload(src + x * 3 + 1) & 0xff
        val r = payload(src + x * 3 + 2) & 0xff
        luma(y * width + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    luma
  }

  /** Encode frames as a minimal RIFF/AVI (one 24-bit DIB video stream) —
    * the fixture generator proving [[decodeAvi]] parses the real nested
    * layout. `rgb(f)(x, y)` supplies frame f's channels. */
  def encodeAvi(width: Int, height: Int, nFrames: Int,
      rgb: Int => (Int, Int) => (Int, Int, Int), fps: Int = 25,
      recWrap: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val frameBytes = rowSize * height
    val out = new java.io.ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32w(v: Int): Unit = { le16w(v & 0xffff); le16w((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String)(body: => Unit): Unit = {
      tag(id)
      val sizeAt = out.size(); le32w(0)
      val start = out.size(); body
      val size = out.size() - start
      if (size % 2 != 0) out.write(0) // even padding
      val b = out.toByteArray
      b(sizeAt) = (size & 0xff).toByte
      b(sizeAt + 1) = ((size >> 8) & 0xff).toByte
      b(sizeAt + 2) = ((size >> 16) & 0xff).toByte
      b(sizeAt + 3) = ((size >> 24) & 0xff).toByte
      out.reset(); out.write(b, 0, b.length)
    }
    chunk("RIFF") {
      tag("AVI ")
      chunk("LIST") {
        tag("hdrl")
        chunk("avih") {
          le32w(1000000 / fps); le32w(frameBytes * fps); le32w(0); le32w(0x10)
          le32w(nFrames); le32w(0); le32w(1); le32w(frameBytes)
          le32w(width); le32w(height); (0 until 4).foreach(_ => le32w(0))
        }
        chunk("LIST") {
          tag("strl")
          chunk("strh") {
            tag("vids"); tag("DIB ")
            le32w(0); le16w(0); le16w(0); le32w(0); le32w(0)
            le32w(1); le32w(fps) // rate/scale
            le32w(0); le32w(nFrames); le32w(frameBytes); le32w(-1)
            le32w(0); le16w(0); le16w(0); le16w(0); le16w(0)
          }
          chunk("strf") {
            le32w(40); le32w(width); le32w(height); le16w(1); le16w(24)
            le32w(0); le32w(frameBytes); le32w(0); le32w(0)
            le32w(0); le32w(0)
          }
        }
      }
      chunk("LIST") {
        tag("movi")
        (0 until nFrames).foreach { f =>
          def frame(): Unit = chunk("00db") {
            val px = rgb(f)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                val (r, g, b) = px(x, height - 1 - y) // bottom-up rows
                out.write(b & 0xff); out.write(g & 0xff); out.write(r & 0xff)
                x += 1
              }
              (width * 3 until rowSize).foreach(_ => out.write(0))
              y += 1
            }
          }
          // recWrap: the VfW interleaved layout — each frame inside its
          // own LIST/'rec ' wrapper
          if (recWrap) chunk("LIST") { tag("rec "); frame() }
          else frame()
        }
      }
    }
    out.toByteArray
  }

  /** Per-kept-frame video report — the frame-sampling face of the real
    * container ([[sampleFrames]]'s byte-stride shape, now with honest
    * parsing): every `stride`-th frame of each decodable AVI reduces to
    * exact integer pixel aggregates; skipped frames are never decoded
    * (the offsets table makes the sample O(kept), not O(frames)).
    * Undecodable payloads are skipped. */
  final case class VideoFrame(doc_id: Long, frame_id: Long, width: Long,
      height: Long, sum_luma: Long, pos_checksum: Long)

  def videoFrameReport(media: Dataset[MediaRow], stride: Int)(
      implicit spark: SparkSession): Dataset[VideoFrame] = {
    require(stride > 0, s"stride must be positive: $stride")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAvi(r.payload).iterator.flatMap { v =>
          (0 until v.frameOffsets.length by stride).iterator.flatMap { f =>
            // an undecodable MJPEG frame drops (decode-or-None per
            // frame); DIB frames were bounds-verified by decodeAvi
            frameLuma(r.payload, v, f).map { luma =>
              var sum = 0L; var pos = 0L; var p = 0
              while (p < luma.length) {
                sum += luma(p); pos += (p + 1).toLong * luma(p); p += 1
              }
              VideoFrame(r.doc_id, f.toLong, v.width.toLong,
                v.height.toLong, sum, pos)
            }
          }
        }
      }
    }
  }

  /** One consecutive-frame delta ([[videoSceneCuts]]): the SAD (sum of
    * absolute per-pixel luma differences) between a decoded frame and
    * the previous DECODED frame, and the thresholded cut flag (1/0). */
  final case class SceneDelta(doc_id: Long, frame_id: Long,
      prev_frame_id: Long, sad: Long, is_cut: Long)

  /** Shot-boundary detection — the video-sampling primitive a
    * training-data pipeline runs to pick representative frames and
    * dedup near-static clips: every frame decodes ONCE per payload and
    * each consecutive DECODED pair reduces to the exact integer SAD,
    * flagged `is_cut` when `sad >= threshold`. A frame that fails its
    * per-frame decode (MJPEG decode-or-None) drops out of the pairing —
    * its neighbors pair with each other — and a one-frame or undecodable
    * payload emits nothing. Rows are per (doc, later frame id). */
  def videoSceneCuts(media: Dataset[MediaRow], threshold: Long)(
      implicit spark: SparkSession): Dataset[SceneDelta] = {
    require(threshold >= 0, s"threshold must be non-negative: $threshold")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAvi(r.payload).iterator.flatMap { v =>
          var prevLuma: Array[Int] = null
          var prevId = -1
          (0 until v.frameOffsets.length).iterator.flatMap { f =>
            frameLuma(r.payload, v, f) match {
              case None => Iterator.empty // dropped frame: pairing skips it
              case Some(luma) =>
                val out =
                  if (prevLuma == null) Iterator.empty
                  else {
                    var sad = 0L
                    var p = 0
                    while (p < luma.length) {
                      sad += math.abs(luma(p) - prevLuma(p))
                      p += 1
                    }
                    Iterator.single(SceneDelta(r.doc_id, f.toLong,
                      prevId.toLong, sad, if (sad >= threshold) 1L else 0L))
                  }
                prevLuma = luma
                prevId = f
                out
            }
          }
        }
      }
    }
  }

  /** Deterministic AVI fixture: frame f's channels extend the shared
    * small-prime maps with a frame term, so an SQL oracle replays every
    * kept frame's aggregates arithmetically. */
  def synthAvi(id: Long, width: Int = 15, height: Int = 9,
      nFrames: Int = 8): Array[Byte] =
    encodeAvi(width, height, nFrames, f => (x, y) => (
      ((id * 7 + f * 41 + x * 3 + y * 5) % 256).toInt,
      ((id * 11 + f * 43 + x * 13 + y * 17) % 256).toInt,
      ((id * 19 + f * 47 + x * 23 + y * 29) % 256).toInt))

  /** Encode frames as a minimal RIFF/AVI holding one MJPEG video stream
    * ('MJPG' fourcc, '00dc' chunks each a standalone baseline JPEG from
    * [[encodeJpegFlat]]) — the real web-video-corpus shape the
    * uncompressed-DIB container doesn't exercise: [[decodeAvi]]'s movi
    * walk COMPOSED with [[decodeJpeg]] per kept frame. `tile(f)(bx, by)`
    * supplies frame f's flat 8×8 blocks, so the composed decode is
    * exact and an SQL oracle replays it. */
  def encodeAviMjpeg(width: Int, height: Int, nFrames: Int,
      tile: Int => (Int, Int) => Int, fps: Int = 25,
      dri: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0)
    val jpegs = Array.tabulate(nFrames)(f =>
      encodeJpegFlat(width, height, tile(f), dri))
    val bufBytes = jpegs.map(_.length).max
    val out = new java.io.ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32w(v: Int): Unit = { le16w(v & 0xffff); le16w((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String)(body: => Unit): Unit = {
      tag(id)
      val sizeAt = out.size(); le32w(0)
      val start = out.size(); body
      val size = out.size() - start
      if (size % 2 != 0) out.write(0) // even padding
      val b = out.toByteArray
      b(sizeAt) = (size & 0xff).toByte
      b(sizeAt + 1) = ((size >> 8) & 0xff).toByte
      b(sizeAt + 2) = ((size >> 16) & 0xff).toByte
      b(sizeAt + 3) = ((size >> 24) & 0xff).toByte
      out.reset(); out.write(b, 0, b.length)
    }
    chunk("RIFF") {
      tag("AVI ")
      chunk("LIST") {
        tag("hdrl")
        chunk("avih") {
          le32w(1000000 / fps); le32w(bufBytes * fps); le32w(0); le32w(0x10)
          le32w(nFrames); le32w(0); le32w(1); le32w(bufBytes)
          le32w(width); le32w(height); (0 until 4).foreach(_ => le32w(0))
        }
        chunk("LIST") {
          tag("strl")
          chunk("strh") {
            tag("vids"); tag("MJPG")
            le32w(0); le16w(0); le16w(0); le32w(0); le32w(0)
            le32w(1); le32w(fps) // rate/scale
            le32w(0); le32w(nFrames); le32w(bufBytes); le32w(-1)
            le32w(0); le16w(0); le16w(0); le16w(0); le16w(0)
          }
          chunk("strf") {
            le32w(40); le32w(width); le32w(height); le16w(1); le16w(24)
            le32w(FourccMjpg); le32w(0); le32w(0); le32w(0)
            le32w(0); le32w(0)
          }
        }
      }
      chunk("LIST") {
        tag("movi")
        jpegs.foreach(j => chunk("00dc") { out.write(j, 0, j.length) })
      }
    }
    out.toByteArray
  }

  /** [[synthAvi]]'s MJPEG twin: frame f's flat 8×8 blocks extend
    * [[synthJpeg]]'s small-prime tile map with a frame term — the oracle
    * replays luma(f, x, y) = tile(f, x/8, y/8) while the Spark side pays
    * container walk + per-frame JPEG entropy decode + IDCT + crop. */
  def synthAviMjpeg(id: Long, width: Int = 15, height: Int = 9,
      nFrames: Int = 8): Array[Byte] =
    encodeAviMjpeg(width, height, nFrames,
      f => (bx, by) => ((id * 7 + f * 41 + bx * 31 + by * 59) % 256).toInt,
      dri = 2)

  /** STUB decode + featurize for formats whose codecs are NOT in this
    * container: fold the payload bytes into a `dim`-bucket histogram
    * normalized by length. Deterministic, so tests can pin it; a real
    * decoder replaces only the body of the per-row lambda — as
    * [[decodeBmp]]/[[decodeReport]] now do for 24-bit BMP. */
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
