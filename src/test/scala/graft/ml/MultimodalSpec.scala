package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("withPayload: byte length, md5, and header of the binary payload") {
    val out = withPayload(Seq((1L, "hello")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_bytes") == 5L)
    assert(out.getAs[String]("payload_md5") == "5d41402abc4b2a76b9719d911017c592")
    assert(out.getAs[String]("header_hex") == "68656C6C") // 'hell'
    assert(out.getAs[Array[Byte]]("payload").sameElements("hello".getBytes("UTF-8")))
  }

  test("sampleBytes takes every Nth byte") {
    val df = withPayload(Seq((1L, "abcdefg")).toDF("doc_id", "text"), "doc_id", "text")
    val sampled = sampleBytes(df, "payload", 3).select("sampled")
      .collect().head.getAs[Array[Byte]](0)
    assert(new String(sampled, "UTF-8") == "adg")
  }

  test("extractFeatures: deterministic stub histogram, normalized, fixed width") {
    implicit val s = spark
    val media = Seq(
      MediaRow(1L, Array[Byte](0, 0, 127, -1)),   // buckets: 0,0,3,7 (dim 8)
      MediaRow(2L, Array.emptyByteArray))
      .toDS()
    val out = extractFeatures(media, dim = 8).collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes == 4)
    assert(out(1L).feature.toSeq == Seq(0.5f, 0f, 0f, 0.25f, 0f, 0f, 0f, 0.25f))
    assert(out(2L).n_bytes == 0)
    assert(out(2L).feature.forall(_ == 0f))
    // determinism: running twice yields identical features
    val again = extractFeatures(media, dim = 8).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(again(1L) == out(1L).feature.toSeq)
  }

  test("BMP codec: encode -> decode round-trips luma exactly, including " +
      "row padding and the bottom-up flip") {
    val rnd = new scala.util.Random(11)
    // widths chosen so row padding is 1, 2, 3, and 0 bytes
    for (w <- Seq(5, 6, 7, 8); h <- Seq(1, 3)) {
      val grid = Array.fill(h, w)(
        (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val bytes = encodeBmp24(w, h, (x, y) => grid(y)(x))
      val img = decodeBmp(bytes).getOrElse(fail(s"decode failed for $w x $h"))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = grid(y)(x)
        assert(img.luma(y * w + x) == (299 * r + 587 * g + 114 * b) / 1000,
          s"luma mismatch at ($x, $y) in $w x $h")
      }
    }
  }

  test("BMP codec: a top-down (negative height) payload decodes to the " +
      "same top-down luma as its bottom-up twin") {
    val w = 5; val h = 3
    val grid = Array.tabulate(h, w)((y, x) => (y * 50 + x, x * 30, 255 - y * 40))
    val up = encodeBmp24(w, h, (x, y) => grid(y)(x))
    // craft the top-down form: negate the height field and reverse the
    // row blocks (top-down stores row 0 first)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val down = up.clone()
    val negH = -h
    down(22) = (negH & 0xff).toByte; down(23) = ((negH >> 8) & 0xff).toByte
    down(24) = ((negH >> 16) & 0xff).toByte; down(25) = ((negH >> 24) & 0xff).toByte
    for (y <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - y) * rowSize, down, 54 + y * rowSize, rowSize)
    val a = decodeBmp(up).get
    val b = decodeBmp(down).get
    assert(a.luma.toSeq == b.luma.toSeq,
      "top-down and bottom-up forms of the same image must decode identically")
  }

  test("BMP codec: 32-bit BGRx, 8-bit palette, and encoder-native " +
      "top-down layouts decode to the 24-bit twin's exact luma, and " +
      "cross-check against ImageIO") {
    val w = 15; val h = 17
    def ch(x: Int, y: Int) =
      ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (255 - x * 11 + y) % 256)
    val want = decodeBmp(encodeBmp24(w, h, ch)).get.luma.toSeq
    for ((desc, bytes) <- Seq(
        "bgrx-32" -> encodeBmp32(w, h, ch),
        "palette-8" -> encodeBmp8(w, h, ch),
        "top-down-24" -> encodeBmp24(w, h, ch, topDown = true))) {
      val got = decodeBmp(bytes).getOrElse(fail(s"$desc refused"))
      assert(got.width == w && got.height == h)
      assert(got.luma.toSeq == want, s"$desc luma diverged from the twin")
      // the JDK agrees on the same bytes
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"$desc: ImageIO refused our bytes")
      var p = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        assert(got.luma(p) == l, s"$desc: pixel ($x,$y) ours=${got.luma(p)} jdk=$l")
        p += 1
      }
    }
    // hostile palettes: an index beyond a short colour table refuses, a
    // table overlapping the pixel offset refuses
    val pal = encodeBmp8(6, 4, (x, y) => { val i = (x + y) % 4; (i * 60, i * 50, i * 40) })
    assert(decodeBmp(pal).nonEmpty)
    def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    val short = pal.clone(); putLE32(short, 46, 2) // claim 2 entries; indices reach 3
    assert(decodeBmp(short).isEmpty,
      "a pixel index beyond the declared colour table must refuse")
    val overlap = pal.clone(); putLE32(overlap, 46, 256) // table would cross pixel data
    assert(decodeBmp(overlap).isEmpty,
      "a colour table overlapping the pixel offset must refuse")
  }

  test("BMP codec: non-BMP, truncated, and unsupported payloads decode to None") {
    assert(decodeBmp(Array.emptyByteArray).isEmpty)
    assert(decodeBmp("not a bitmap at all, just text padding padding".getBytes).isEmpty)
    val ok = encodeBmp24(4, 2, (_, _) => (1, 2, 3))
    assert(decodeBmp(ok).nonEmpty)
    assert(decodeBmp(ok.take(ok.length - 1)).isEmpty, "truncated pixel array")
    val wrongBpp = ok.clone(); wrongBpp(28) = 32.toByte
    assert(decodeBmp(wrongBpp).isEmpty,
      "a 32-bpp flag on a 24-bit-sized pixel array is truncated — refused")
    val bpp16 = ok.clone(); bpp16(28) = 16.toByte
    assert(decodeBmp(bpp16).isEmpty, "16-bpp must be refused, not misread")
    val compressed = ok.clone(); compressed(30) = 1.toByte
    assert(decodeBmp(compressed).isEmpty, "RLE compression must be refused")
    // hostile header: width near 2^31 must SKIP, not overflow the Int
    // size products into a NegativeArraySizeException that kills the batch
    val hostile = ok.clone()
    hostile(18) = 0xff.toByte; hostile(19) = 0xff.toByte
    hostile(20) = 0xff.toByte; hostile(21) = 0x7f.toByte
    assert(decodeBmp(hostile).isEmpty, "overflowing width must be refused")
    // hostile height 0x80000000: abs(Int.MinValue) stays negative, so it
    // slipped the old == 0 guard — must be refused, never crash the batch
    val hostileH = ok.clone()
    hostileH(22) = 0; hostileH(23) = 0; hostileH(24) = 0
    hostileH(25) = 0x80.toByte
    assert(decodeBmp(hostileH).isEmpty, "Int.MinValue height must be refused")
    val negBigH = ok.clone()
    negBigH(22) = 0xff.toByte; negBigH(23) = 0xff.toByte
    negBigH(24) = 0xff.toByte; negBigH(25) = 0x7f.toByte
    assert(decodeBmp(negBigH).isEmpty, "overflowing height must be refused")
  }

  test("PNM codec: P1/P4 bitmaps decode with 1 = black, packed digits, " +
      "bit-padded rows, and the decode-or-None hostile contract") {
    // width 13: P4 rows pad 3 bits; the checker pattern exercises both
    // bit values in every byte
    val w = 13; val h = 5
    def black(x: Int, y: Int) = (x + y) % 2 == 0 || x == 7
    val want = for (y <- 0 until h; x <- 0 until w)
      yield (if (black(x, y)) 0 else 255)
    for ((desc, bytes) <- Seq(
        "P4" -> encodePbm(w, h, black),
        "P1-spaced" -> encodePbm(w, h, black, raw = false),
        "P1-packed" -> encodePbm(w, h, black, raw = false, packed = true))) {
      val got = decodePnm(bytes).getOrElse(fail(s"$desc refused"))
      assert(got.width == w && got.height == h)
      assert(got.luma.toSeq == want, s"$desc luma diverged (1 must be black)")
      // the magic-byte router reaches the same decode
      assert(decodeImage(bytes).get.luma.toSeq == want, s"$desc routing")
    }
    // a P1 comment mid-raster is skipped like a header comment
    val commented = ("P1\n2 2\n0 1 # trailing comment\n1 0\n")
      .getBytes("US-ASCII")
    assert(decodePnm(commented).get.luma.toSeq == Seq(255, 0, 0, 255))
    // hostile: truncated P4 raster, P1 with too few digits, a non-binary
    // digit, and hostile dims refused before allocation
    val p4 = encodePbm(w, h, black)
    assert(decodePnm(p4.take(p4.length - 1)).isEmpty, "truncated P4")
    assert(decodePnm("P1\n3 2\n0 1 0 1 0".getBytes).isEmpty, "short P1")
    assert(decodePnm("P1\n2 2\n0 1 2 0".getBytes).isEmpty, "digit 2 refused")
    assert(decodePnm("P1\n2147483647 2147483647\n0".getBytes).isEmpty,
      "hostile P1 dims refused before allocation")
    assert(decodePnm("P4\n2147483647 2147483647\nA".getBytes).isEmpty,
      "hostile P4 dims refused before allocation")
  }

  test("PNM codec: raw PPM/PGM round-trip to the same luma as the BMP " +
      "twin of the same channels") {
    val w = 5; val h = 3
    def ch(x: Int, y: Int) = (x * 40 + y, 255 - y * 50, x * 17 + y * 9)
    val viaBmp = decodeBmp(encodeBmp24(w, h, ch)).get
    val viaPpm = decodePnm(encodePpm(w, h, ch)).get
    assert((viaPpm.width, viaPpm.height) == (w, h))
    assert(viaPpm.luma.toSeq == viaBmp.luma.toSeq,
      "P6 luma must equal the BMP twin's (same BT.601 arithmetic)")
    val viaPgm = decodePnm(encodePgm(w, h, (x, y) => {
      val (r, g, b) = ch(x, y); (299 * r + 587 * g + 114 * b) / 1000
    })).get
    assert(viaPgm.luma.toSeq == viaBmp.luma.toSeq,
      "P5 gray must pass through as luma unchanged")
  }

  test("PNM codec: ASCII P2/P3 with comments and ragged whitespace decode " +
      "equal to their raw twins") {
    val w = 3; val h = 2
    def ch(x: Int, y: Int) = (x * 50 + y * 7, y * 90 + 3, 255 - x * 60)
    val raw = decodePnm(encodePpm(w, h, ch)).get
    val asciiP3 = new StringBuilder("P3 # a comment\n # another\n")
    asciiP3.append(s" $w\t$h\n255\n")
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ch(x, y); asciiP3.append(s"$r\n $g\t$b  ")
    }
    val gotP3 = decodePnm(asciiP3.toString.getBytes("US-ASCII")).get
    assert(gotP3.luma.toSeq == raw.luma.toSeq, "P3 must equal its P6 twin")
    val grays = for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = ch(x, y); (299 * r + 587 * g + 114 * b) / 1000
    }
    val asciiP2 = s"P2\n$w $h\n255\n${grays.mkString(" ")}\n"
    val gotP2 = decodePnm(asciiP2.getBytes("US-ASCII")).get
    assert(gotP2.luma.toSeq == raw.luma.toSeq, "P2 must equal its P5 twin")
  }

  test("PNM codec: bitmap kinds, 16-bit maxval, truncation, over-maxval " +
      "samples, and hostile dimensions decode to None") {
    val ok = encodePpm(4, 2, (_, _) => (1, 2, 3))
    assert(decodePnm(ok).nonEmpty)
    assert(decodePnm("P4\n4 2\n".getBytes).isEmpty, "P4 bitmap unsupported")
    assert(decodePnm("P7\nWIDTH 4\n".getBytes).isEmpty, "P7 PAM unsupported")
    assert(decodePnm("P5\n4 2\n65535\n".getBytes ++ new Array[Byte](16)).isEmpty,
      "16-bit maxval must be refused, not misread as bytes")
    assert(decodePnm(ok.take(ok.length - 1)).isEmpty, "truncated raw samples")
    assert(decodePnm("P2\n2 1\n255\n12 999\n".getBytes).isEmpty,
      "ASCII sample above maxval must be refused")
    assert(decodePnm("P2\n2 1\n255\n12 xy\n".getBytes).isEmpty,
      "non-numeric ASCII sample must be refused")
    // hostile dimensions: the Long product must refuse before allocating
    assert(decodePnm("P5\n2000000000 2000000000\n255\n  ".getBytes).isEmpty)
    assert(decodePnm("P2\n2000000000 2000000000\n255\n 1".getBytes).isEmpty)
    assert(decodePnm("P6\n999999999999999999999 2\n255\n".getBytes).isEmpty,
      "header token overflowing Int must be refused")
    // ADVICE r12: dims chosen so nSamplesL = 2^63-2 and nSamplesL*2 wraps
    // to -4, slipping the ASCII ×2 bound into new Array[Int](-2) — the
    // nPxL > Int.MaxValue guard must refuse before any size arithmetic
    assert(decodePnm("P3\n2147483647 1431655766\n255\n 1 1 1\n".getBytes)
      .isEmpty, "Long-wrapping ASCII sample count must be refused")
    // raw twin: both dims near 2^31 wrap nSamplesL negative, which would
    // slip the dataStart+nSamplesL truncation check and return a silently
    // wrong 1-pixel image claiming 2^31-1 × 2^31-1 dimensions
    assert(decodePnm("P6\n2147483647 2147483647\n255\n AAA".getBytes)
      .isEmpty, "Long-wrapping raw sample count must be refused")
  }

  test("PNG codec: every color type and every row filter round-trips to " +
      "the BMP twin's exact luma, through real deflate + chunk CRCs") {
    val w = 15; val h = 17 // odd width: per-row byte counts not 4-aligned
    def ch(x: Int, y: Int) =
      ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (255 - x * 11 + y) % 256)
    val want = decodeBmp(encodeBmp24(w, h, ch)).get.luma.toSeq
    val gray = (for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = ch(x, y); (299 * r + 587 * g + 114 * b) / 1000
    }).toSeq
    for (ct <- Seq(0, 2, 3, 4, 6)) {
      val got = decodePng(encodePng(w, h, ch, colorType = ct))
        .getOrElse(fail(s"colorType $ct failed to decode"))
      assert(got.width == w && got.height == h)
      assert(got.luma.toSeq == (if (ct == 0 || ct == 4) gray else want),
        s"colorType $ct luma mismatch")
    }
    // each filter type in isolation (the default rotation could mask a
    // bug in one filter with a compensating bug in another)
    for (ft <- 0 to 4) {
      val got = decodePng(encodePng(w, h, ch, rowFilter = _ => ft))
        .getOrElse(fail(s"filter $ft failed to decode"))
      assert(got.luma.toSeq == want, s"filter $ft luma mismatch")
    }
  }

  test("PNG codec: Adam7 interlace round-trips every colour type to the " +
      "sequential decode, including pass-degenerate dims") {
    def ch(x: Int, y: Int) =
      ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (255 - x * 11 + y) % 256)
    // dims straddling the pass grid: ≥8 both ways (all 7 passes), tiny
    // dims where several passes are EMPTY, and single-row/column edges
    for ((w, h) <- Seq((15, 17), (8, 8), (7, 5), (4, 4), (3, 2), (1, 9),
        (9, 1), (1, 1)); ct <- Seq(0, 2, 3, 4, 6)) {
      val plain = decodePng(encodePng(w, h, ch, colorType = ct))
        .getOrElse(fail(s"sequential $w x $h ct=$ct failed"))
      val inter = decodePng(encodePng(w, h, ch, colorType = ct,
        interlace = true))
        .getOrElse(fail(s"Adam7 $w x $h ct=$ct failed to decode"))
      assert(inter.width == w && inter.height == h)
      assert(inter.luma.toSeq == plain.luma.toSeq,
        s"Adam7 $w x $h ct=$ct luma diverges from sequential")
    }
    // 16-bit Adam7 too (filter byte distance 2·channels within each pass)
    for (ct <- Seq(0, 2, 4, 6)) {
      val plain = decodePng(encodePng(15, 17, ch, colorType = ct,
        bitDepth = 16)).get
      val inter = decodePng(encodePng(15, 17, ch, colorType = ct,
        bitDepth = 16, interlace = true))
        .getOrElse(fail(s"16-bit Adam7 ct=$ct failed to decode"))
      assert(inter.luma.toSeq == plain.luma.toSeq)
    }
  }

  test("PNG codec: palette depths 1/2/4/8, sub-8-bit gray expansion, and " +
      "16-bit high-byte reduction all match the spec arithmetic") {
    // palette at every legal depth: k distinct colours fitting 2^d slots
    for (d <- Seq(1, 2, 4, 8)) {
      val k = 1 << d
      def ch(x: Int, y: Int) = {
        val i = (x + y * 7) % k
        (i * 255 / math.max(k - 1, 1), (i * 37) % 256, (i * 91) % 256)
      }
      val got = decodePng(encodePng(9, 7, ch, colorType = 3, bitDepth = d))
        .getOrElse(fail(s"palette depth $d failed to decode"))
      val want = for (y <- 0 until 7; x <- 0 until 9) yield {
        val (r, g, b) = ch(x, y); (299 * r + 587 * g + 114 * b) / 1000
      }
      assert(got.luma.toSeq == want, s"palette depth $d luma mismatch")
    }
    // sub-8-bit gray: sample v expands by exactly 255/(2^d−1)
    for (d <- Seq(1, 2, 4)) {
      val mul = 255 / ((1 << d) - 1)
      def ch(x: Int, y: Int) = {
        val l = (((x + y * 3) % (1 << d)) * mul)
        (l, l, l) // BT.601 of (l,l,l) = l exactly: 299+587+114 = 1000
      }
      val got = decodePng(encodePng(11, 5, ch, colorType = 0, bitDepth = d))
        .getOrElse(fail(s"gray depth $d failed to decode"))
      val want = for (y <- 0 until 5; x <- 0 until 11)
        yield ((x + y * 3) % (1 << d)) * mul
      assert(got.luma.toSeq == want, s"gray depth $d luma mismatch")
    }
    // 16-bit: the encoder stores v·0x101, the decoder keeps the high byte
    def ch16(x: Int, y: Int) = ((x * 29 + y) % 256, (y * 53 + x) % 256,
      (x * 3 + y * 17) % 256)
    val want8 = decodePng(encodePng(13, 6, ch16, colorType = 2)).get.luma.toSeq
    for (ct <- Seq(0, 2, 4, 6)) {
      val got = decodePng(encodePng(13, 6, ch16, colorType = ct,
        bitDepth = 16)).getOrElse(fail(s"16-bit ct=$ct failed to decode"))
      val gray8 = decodePng(encodePng(13, 6, ch16, colorType = 0)).get.luma
      assert(got.luma.toSeq ==
        (if (ct == 0 || ct == 4) gray8.toSeq else want8),
        s"16-bit ct=$ct luma mismatch")
    }
  }

  test("PNG codec: palette and interlaced decodes cross-check against " +
      "the JDK's ImageIO on the same bytes") {
    def ch(x: Int, y: Int) =
      ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (255 - x * 11 + y) % 256)
    for ((desc, bytes) <- Seq(
        "palette-8" -> encodePng(15, 17, ch, colorType = 3),
        "palette-4" -> encodePng(5, 3,
          (x, y) => { val i = (x + y) % 16; (i * 17, i * 5, i * 11) },
          colorType = 3, bitDepth = 4),
        "adam7-rgb" -> encodePng(15, 17, ch, colorType = 2, interlace = true),
        "adam7-gray" -> encodePng(12, 9, ch, colorType = 0,
          interlace = true))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"$desc: ImageIO refused our bytes")
      val got = decodePng(bytes).getOrElse(fail(s"$desc: our decode failed"))
      assert(got.width == img.getWidth && got.height == img.getHeight)
      // gray PNGs load as a linear-gray raster whose getRGB() applies a
      // linear→sRGB transform — compare the raw raster sample there
      val grayRaster = img.getColorModel.getColorSpace.getType ==
        java.awt.color.ColorSpace.TYPE_GRAY
      var p = 0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val l =
          if (grayRaster) img.getRaster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
          }
        assert(got.luma(p) == l, s"$desc: pixel ($x,$y) ours=${got.luma(p)} jdk=$l")
        p += 1
      }
    }
  }

  test("PNG codec: bad CRC, truncated IDAT, hostile dims, palette, " +
      "interlace, 16-bit depth, and a lying raster length decode to None") {
    val ok = encodePng(6, 5, (x, y) => (x * 20, y * 40, 128))
    assert(decodePng(ok).nonEmpty)
    // flip one byte inside the first IDAT's data: the chunk CRC must refuse
    def chunkOffset(b: Array[Byte], typ: String): Int = {
      var pos = 8
      while (!(new String(b, pos + 4, 4, "US-ASCII") == typ)) {
        pos += 12 + (((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
          ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff))
      }
      pos
    }
    val idat = chunkOffset(ok, "IDAT")
    val flipped = ok.clone(); flipped(idat + 8) = (flipped(idat + 8) ^ 0x41).toByte
    assert(decodePng(flipped).isEmpty, "a corrupted IDAT byte must fail CRC")
    // truncation anywhere: header, mid-chunk, before IEND
    for (keep <- Seq(7, 20, idat + 6, ok.length - 1))
      assert(decodePng(ok.take(keep)).isEmpty, s"truncated at $keep")
    // rewrite IHDR fields and re-sign the CRC (a well-formed but hostile
    // header — the CRC gate must not be the only defense)
    def withIhdr(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = ok.clone(); mut(b)
      val c = new java.util.zip.CRC32; c.update(b, 12, 17)
      val v = c.getValue.toInt
      b(29) = ((v >>> 24) & 0xff).toByte; b(30) = ((v >>> 16) & 0xff).toByte
      b(31) = ((v >>> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
      b
    }
    assert(decodePng(withIhdr(b => { b(16) = 0x40; b(20) = 0x40 })).isEmpty,
      "2^30 x 2^30 dims must be refused before allocation")
    assert(decodePng(withIhdr(_(25) = 3)).isEmpty,
      "palette colour type without a PLTE chunk refused")
    assert(decodePng(withIhdr(_(28) = 1)).isEmpty,
      "Adam7 flag on a sequential-sized raster: total mismatch refused")
    assert(decodePng(withIhdr(_(24) = 16)).isEmpty,
      "16-bit flag on an 8-bit-sized raster: truncated refused")
    assert(decodePng(withIhdr(_(24) = 4)).isEmpty,
      "depth 4 is illegal for colour type 2")
    // declared dims smaller than the compressed raster: the stream
    // decompresses to MORE than width*height rows — a lying header
    assert(decodePng(withIhdr(_(23) = 2)).isEmpty,
      "an over-long IDAT stream must be refused, not silently cropped")
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(decodePng(sig ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("PNG codec: hostile palettes decode to None — out-of-range index, " +
      "bad PLTE length, PLTE after IDAT, PLTE on grayscale") {
    def ch(x: Int, y: Int) = { val i = (x + y) % 4; (i * 60, i * 50, i * 40) }
    val ok = encodePng(6, 5, ch, colorType = 3)
    assert(decodePng(ok).nonEmpty)
    def chunkOffset(b: Array[Byte], typ: String): Int = {
      var pos = 8
      while (!(new String(b, pos + 4, 4, "US-ASCII") == typ)) {
        pos += 12 + (((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
          ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff))
      }
      pos
    }
    def resign(b: Array[Byte], pos: Int): Unit = {
      val len = ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
        ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      val c = new java.util.zip.CRC32; c.update(b, pos + 4, len + 4)
      val v = c.getValue.toInt
      b(pos + 8 + len) = ((v >>> 24) & 0xff).toByte
      b(pos + 9 + len) = ((v >>> 16) & 0xff).toByte
      b(pos + 10 + len) = ((v >>> 8) & 0xff).toByte
      b(pos + 11 + len) = (v & 0xff).toByte
    }
    // shrink the PLTE to ONE entry (length 3, re-signed, bytes spliced
    // out): indices ≥ 1 in the raster are now out of range
    val plte = chunkOffset(ok, "PLTE")
    val plteLen = ((ok(plte) & 0xff) << 24) | ((ok(plte + 1) & 0xff) << 16) |
      ((ok(plte + 2) & 0xff) << 8) | (ok(plte + 3) & 0xff)
    assert(plteLen == 12, "fixture should have 4 palette entries")
    val shrunk = ok.take(plte) ++ Array[Byte](0, 0, 0, 3) ++
      ok.slice(plte + 4, plte + 8 + 3) ++ new Array[Byte](4) ++
      ok.drop(plte + 8 + plteLen + 4)
    resign(shrunk, plte)
    assert(decodePng(shrunk).isEmpty,
      "a raster index beyond the PLTE must refuse, not wrap or clamp")
    // PLTE length not divisible by 3
    val badLen = ok.take(plte) ++ Array[Byte](0, 0, 0, 11) ++
      ok.slice(plte + 4, plte + 8 + 11) ++ new Array[Byte](4) ++
      ok.drop(plte + 8 + plteLen + 4)
    resign(badLen, plte)
    assert(decodePng(badLen).isEmpty, "PLTE length % 3 != 0 refused")
    // PLTE moved AFTER the first IDAT (spec orders it before): swap the
    // two adjacent chunks
    val idat = chunkOffset(ok, "IDAT")
    val plteChunk = ok.slice(plte, plte + 8 + plteLen + 4)
    val idatLen0 = ((ok(idat) & 0xff) << 24) | ((ok(idat + 1) & 0xff) << 16) |
      ((ok(idat + 2) & 0xff) << 8) | (ok(idat + 3) & 0xff)
    val idatChunk = ok.slice(idat, idat + 8 + idatLen0 + 4)
    val moved = ok.take(plte) ++ idatChunk ++ plteChunk ++
      ok.drop(idat + idatChunk.length)
    assert(decodePng(moved).isEmpty, "PLTE after IDAT refused")
    // PLTE on a grayscale image (spec §11.2.3 forbids it for types 0/4)
    val grayOk = encodePng(6, 5, ch, colorType = 0)
    val gIdat = chunkOffset(grayOk, "IDAT")
    val grayWithPlte = grayOk.take(gIdat) ++ plteChunk ++ grayOk.drop(gIdat)
    assert(decodePng(grayWithPlte).isEmpty, "PLTE on grayscale refused")
  }

  test("GIF codec: real-LZW round-trip equals the BMP twin; a large " +
      "few-color image pushes the dictionary through every width bump " +
      "and a table-full clear") {
    val w = 15; val h = 17
    def ch(x: Int, y: Int) =
      ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (255 - x * 11 + y) % 256)
    val want = decodeBmp(encodeBmp24(w, h, ch)).get.luma.toSeq
    val got = decodeGif(encodeGif(w, h, ch)).get
    assert(got.width == w && got.height == h)
    assert(got.luma.toSeq == want, "GIF luma diverged from the BMP twin")
    // 320×200 3-color repetitive pattern: 64k pixels of high-redundancy
    // content drives the LZW dictionary through width 3→12 and past 4096
    // entries (the clear-on-full path) — the arithmetic a tiny fixture
    // never reaches
    val W = 320; val H = 200
    def pat(x: Int, y: Int) =
      if ((x / 3 + y / 5) % 7 == 0) (255, 0, 0)
      else if (x % 11 == 0) (0, 255, 0) else (0, 0, 255)
    val dec = decodeGif(encodeGif(W, H, pat)).get
    val wantPat = for (y <- 0 until H; x <- 0 until W) yield {
      val (r, g, b) = pat(x, y); (299 * r + 587 * g + 114 * b) / 1000
    }
    assert(dec.width == W && dec.height == H)
    assert(dec.luma.toSeq == wantPat,
      "deep-dictionary GIF decode diverged from the generator")
  }

  test("GIF codec agrees with the JDK ImageIO implementation in BOTH " +
      "directions — our decoder on its bytes, its decoder on ours") {
    import java.awt.image.BufferedImage
    val w = 37; val h = 23
    def rgbOf(x: Int, y: Int) =
      (((x * 31 + y * 7) % 256) << 16) | (((x * 13 + y * 101) % 256) << 8) |
        ((x + y * 3) % 256)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbOf(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos),
      "the JDK has no GIF writer in this container?")
    val theirs = baos.toByteArray
    // both decoders read the SAME file (TYPE_BYTE_INDEXED quantizes, so
    // the reference is ImageIO's own read-back, not the generator)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(theirs))
    def lumaOf(im: java.awt.image.BufferedImage) =
      for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) yield {
        val v = im.getRGB(x, y)
        (299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) +
          114 * (v & 0xff)) / 1000
      }
    val mine = decodeGif(theirs)
      .getOrElse(fail("our decoder refused a JDK-written GIF"))
    assert(mine.luma.toSeq == lumaOf(ref),
      "our decoder disagreed with the JDK decoder on a JDK-written GIF")
    // reverse: the JDK decoder reads OUR encoder's LZW output (a
    // 61-color image — a GIF needs a <=256-color palette)
    def chp(x: Int, y: Int) = {
      val k = (x * 7 + y * 13) % 61
      (k * 4, 255 - k * 2, (k * 3) % 256)
    }
    val ours = encodeGif(w, h, chp)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(jdk != null, "the JDK decoder refused our GIF")
    assert(lumaOf(jdk) == decodeGif(ours).get.luma.toSeq,
      "the JDK decoder disagreed with ours on our own GIF")
  }

  test("GIF codec: truncation, lying dims, and trailer-first decode to " +
      "None; the interlace flag permutes rows, never crashes") {
    // 4-color fixture: GCT holds 4 entries (12 bytes), so the image
    // descriptor starts at byte 25 (header 6 + LSD 7 + GCT 12)
    def ch4(x: Int, y: Int) =
      Seq((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))((x + y) % 4)
    val ok = encodeGif(10, 8, ch4)
    assert(decodeGif(ok).nonEmpty)
    assert(ok(25) == 0x2c, "fixture layout drifted — adjust the offsets")
    assert(decodeGif("GIF90a".getBytes ++ ok.drop(6)).isEmpty,
      "an unknown version magic must be refused")
    for (keep <- Seq(5, 13, 27, ok.length - 2))
      assert(decodeGif(ok.take(keep)).isEmpty, s"truncated at $keep")
    // flipping the interlace flag on sequential data yields a VALID
    // decode with 4-pass-permuted rows — the flag must be honored (the
    // true interlaced reference is the JDK cross-test above, whose
    // writer emits interlaced GIFs by default)
    val inter = ok.clone(); inter(34) = (inter(34) | 0x40).toByte
    val ip = decodeGif(inter).get
    assert(ip.luma.toSeq != decodeGif(ok).get.luma.toSeq,
      "the interlace flag was ignored")
    assert(ip.luma.sorted.toSeq == decodeGif(ok).get.luma.sorted.toSeq,
      "deinterlacing must permute rows, not change pixels")
    // shrink the declared height (in BOTH the logical screen and the
    // image descriptor, so the placement check upstream stays quiet):
    // the stream then holds MORE pixels than w×h — a lying header must
    // refuse, not silently crop
    val lie = ok.clone(); lie(8) = 4; lie(32) = 4
    assert(decodeGif(lie).isEmpty, "an over-long pixel stream must refuse")
    // grow it: EOI arrives before w×h pixels — an underrun, same answer
    val lie2 = ok.clone(); lie2(8) = 100; lie2(32) = 100
    assert(decodeGif(lie2).isEmpty, "an under-run pixel stream must refuse")
    assert(decodeGif(ok.take(25) :+ 0x3b.toByte).isEmpty,
      "a trailer before any image must be refused")
  }

  test("GIF codec: a frame positioned inside a larger logical screen is " +
      "refused, not decoded with its placement silently dropped") {
    // reference decoders composite such a frame onto the screen; the
    // strict decode-or-None contract refuses instead (ADVICE r13)
    def ch4(x: Int, y: Int) =
      Seq((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))((x + y) % 4)
    val ok = encodeGif(10, 8, ch4)
    assert(ok(25) == 0x2c, "fixture layout drifted — adjust the offsets")
    // nonzero left offset (descriptor left low byte at 26)
    val shifted = ok.clone(); shifted(26) = 2
    assert(decodeGif(shifted).isEmpty, "a left-shifted frame must refuse")
    // nonzero top offset (descriptor top low byte at 28)
    val dropped = ok.clone(); dropped(28) = 1
    assert(decodeGif(dropped).isEmpty, "a top-shifted frame must refuse")
    // frame smaller than the screen (screen width grown, frame kept)
    val wide = ok.clone(); wide(6) = 20
    assert(decodeGif(wide).isEmpty,
      "a frame narrower than its screen must refuse")
  }

  test("JPEG codec: luma within a few steps of the JDK decoder on " +
      "JDK-encoded baseline JPEGs — color 4:2:0, grayscale, and noisy " +
      "content; progressive and truncated streams decode to None") {
    import java.awt.image.BufferedImage
    def writeJpeg(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos),
        "the JDK has no JPEG writer in this container?")
      baos.toByteArray
    }
    def lumaOf(im: java.awt.image.BufferedImage): IndexedSeq[Int] =
      for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) yield {
        // 1-band images: read RAW samples — TYPE_BYTE_GRAY is a LINEAR
        // gray space, so getRGB would apply a linear→sRGB conversion the
        // JPEG bytes never contained
        if (im.getRaster.getNumBands == 1) im.getRaster.getSample(x, y, 0)
        else {
          val v = im.getRGB(x, y)
          (299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) +
            114 * (v & 0xff)) / 1000
        }
      }
    // both decoders now reconstruct luma through clamped RGB with the
    // IJG fancy upsampler, so the residual tolerance is down to IDCT
    // variation and fixed-point-vs-double color-convert rounding
    def check(bytes: Array[Byte], label: String, maxTol: Int,
        meanTol: Double): Unit = {
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val want = lumaOf(ref)
      val mine = decodeJpeg(bytes)
        .getOrElse(fail(s"$label: our decoder refused a JDK JPEG"))
      assert(mine.width == ref.getWidth && mine.height == ref.getHeight)
      val diffs = mine.luma.toSeq.zip(want).map { case (a, b) =>
        math.abs(a - b) }
      assert(diffs.max <= maxTol,
        s"$label: max luma diff ${diffs.max} > $maxTol vs the JDK decoder")
      val mean = diffs.sum.toDouble / diffs.size
      assert(mean <= meanTol, s"$label: mean luma diff $mean > $meanTol")
    }
    val w = 64; val h = 48
    val smooth = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      smooth.setRGB(x, y,
        ((x * 3 + 20) << 16) | ((y * 4 + 10) << 8) | ((x + y) * 2))
    check(writeJpeg(smooth), "smooth color", 3, 1.0)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 4 + y * 2) % 256
      gray.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    check(writeJpeg(gray), "grayscale", 3, 1.0)
    // deterministic high-frequency content: noisy chroma decodes to
    // out-of-gamut (Y, Cb, Cr) triples whose RGB clamps on both sides —
    // before the chroma-reconstruction extension this case sat at
    // max 12 / mean 2.0 against the JDK; with clamped RGB + the IJG
    // fancy upsampler it pins at a rounding-level bound
    val noisy = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      noisy.setRGB(x, y,
        (((x * 131 + y * 37) % 256) << 16) |
          (((x * 29 + y * 211) % 256) << 8) | ((x * 197 + y * 73) % 256))
    check(writeJpeg(noisy), "noisy color", 4, 1.0)
    // an odd-size image: the partial-MCU crop path
    val odd = new BufferedImage(21, 13, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 13; x <- 0 until 21)
      odd.setRGB(x, y, ((x * 9 + 30) << 16) | ((y * 11 + 40) << 8) | 90)
    check(writeJpeg(odd), "odd dims", 3, 1.0)
    // progressive (SOF2): the multi-scan spectral-selection /
    // successive-approximation path must land on the same picture as
    // the JDK's decode of the same bytes
    def writeProgressive(img: BufferedImage): Array[Byte] = {
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val pout = new java.io.ByteArrayOutputStream()
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(pout))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose()
      pout.toByteArray
    }
    check(writeProgressive(smooth), "progressive smooth color", 3, 1.0)
    check(writeProgressive(noisy), "progressive noisy color", 4, 1.0)
    check(writeProgressive(odd), "progressive odd dims", 3, 1.0)
    val grayImg = new BufferedImage(37, 23, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 23; x <- 0 until 37) {
      val g = (x * 11 + y * 29) % 256
      grayImg.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    check(writeProgressive(grayImg), "progressive grayscale", 3, 1.0)
    // truncation inside a progressive scan refuses, never crashes
    val prog = writeProgressive(smooth)
    for (keep <- Seq(20, prog.length / 2, prog.length - 3))
      assert(decodeJpeg(prog.take(keep)).isEmpty, s"prog truncated at $keep")
    // truncation must refuse when it cuts the headers or the entropy
    // data (a cut past the complete scan loses only the EOI — the image
    // is whole, and decoding it is correct, so cut INSIDE the scan)
    val ok = writeJpeg(smooth)
    val sos = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xda).get
    for (keep <- Seq(1, 3, 20, sos + 5, sos + 15, sos + 25))
      assert(decodeJpeg(ok.take(keep)).isEmpty, s"truncated at $keep")
    assert(decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    // the router sniffs 0xFFD8
    assert(decodeImage(ok).get.luma.toSeq == decodeJpeg(ok).get.luma.toSeq)
  }

  test("JPEG codec: restart markers reset the DC predictors exactly — a " +
      "flat-tile DRI stream decodes losslessly") {
    // The JDK writer exposes no DRI knob, so the fixture comes from the
    // production encodeJpegFlat (grayscale, quant all-ones, DC-only
    // blocks: F(0,0) = 8·(g − 128) IDCTs back to g EXACTLY, pinned
    // value-for-value with no tolerance) — the stream interleaves real
    // RST0..7 markers every `dri` MCUs with predictor resets, the path
    // no ImageIO fixture can reach.
    val bw = 5; val bh = 3; val dri = 3 // 15 blocks, restarts mid-row
    def tile(bx: Int, by: Int) = 16 + bx * 13 + by * 40
    val jpeg = encodeJpegFlat(bw * 8, bh * 8, tile, dri = dri)
    val dec = decodeJpeg(jpeg).getOrElse(fail("the DRI fixture was refused"))
    assert(dec.width == bw * 8 && dec.height == bh * 8)
    for (by <- 0 until bh; bx <- 0 until bw; y <- 0 until 8; x <- 0 until 8)
      assert(dec.luma((by * 8 + y) * bw * 8 + bx * 8 + x) == tile(bx, by),
        s"tile ($bx,$by) pixel ($x,$y) diverged — DC/restart arithmetic")
    // a wrong marker where an RSTn belongs must refuse
    val idx = (0 until jpeg.length - 1).indexWhere(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) >= 0xd0 &&
        (jpeg(i + 1) & 0xff) <= 0xd7)
    assert(idx > 0, "fixture must contain at least one restart marker")
    val bad = jpeg.clone(); bad(idx + 1) = 0xc8.toByte
    assert(decodeJpeg(bad).isEmpty, "a non-RST marker mid-scan must refuse")
  }

  test("JPEG codec: partial-MCU dims crop exactly, and synthJpeg replays " +
      "as luma(x, y) = tile(x/8, y/8) — the gate oracle's arithmetic — " +
      "in BOTH its baseline and progressive encodings") {
    // ids ≡ 5 (mod 12) encode baseline, ≡ 11 progressive — the gate
    // routes both through one oracle because flat tiles decode exactly
    // either way
    for (id <- Seq(5L, 11L)) {
      val jpeg = synthJpeg(id) // 15×17: partial blocks right and bottom
      val progressive = (0 until jpeg.length - 1).exists(i =>
        (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xc2)
      assert(progressive == (id == 11L),
        s"id $id must encode ${if (id == 11L) "SOF2" else "SOF0"}")
      val dec = decodeJpeg(jpeg).getOrElse(fail(s"synthJpeg($id) refused"))
      assert(dec.width == 15 && dec.height == 17)
      for (y <- 0 until 17; x <- 0 until 15)
        assert(dec.luma(y * 15 + x) ==
          ((id * 7 + (x / 8) * 31 + (y / 8) * 59) % 256).toInt,
          s"id $id pixel ($x,$y) diverged from the tile map")
      // the router must reach it (the gate goes through decodeImage)
      assert(decodeImage(jpeg).get.luma.toSeq == dec.luma.toSeq)
    }
    // the two encodings of the SAME tiles decode identically
    val base = encodeJpegFlat(15, 17, (bx, by) => bx * 40 + by * 30, dri = 2)
    val prog = encodeJpegFlat(15, 17, (bx, by) => bx * 40 + by * 30, dri = 2,
      progressive = true)
    assert(decodeJpeg(base).get.luma.toSeq == decodeJpeg(prog).get.luma.toSeq,
      "baseline and progressive flat-tile decodes must be identical")
  }

  test("JPEG codec: 0xFF fill bytes before a marker are legal " +
      "(T.81 B.1.1.2) and decode unchanged") {
    val jpeg = synthJpeg(3L)
    val want = decodeJpeg(jpeg).get.luma.toSeq
    // insert fill bytes before the SOF0 marker's 0xFF
    val sof = (0 until jpeg.length - 1).indexWhere(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xc0)
    assert(sof > 0)
    val filled = jpeg.take(sof) ++ Array.fill(3)(0xff.toByte) ++ jpeg.drop(sof)
    val dec = decodeJpeg(filled)
      .getOrElse(fail("fill bytes before SOF0 were refused"))
    assert(dec.luma.toSeq == want, "fill bytes changed the decode")
    // and before a restart marker inside the entropy stream
    val rst = (sof until filled.length - 1).find(i =>
      (filled(i) & 0xff) == 0xff && (filled(i + 1) & 0xff) >= 0xd0 &&
        (filled(i + 1) & 0xff) <= 0xd7).getOrElse(
      fail("the fixture must contain a restart marker"))
    val filled2 = filled.take(rst) ++ Array.fill(2)(0xff.toByte) ++
      filled.drop(rst)
    assert(decodeJpeg(filled2).exists(_.luma.toSeq == want),
      "fill bytes before an RSTn changed or refused the decode")
  }

  test("decodeImage routes by sniffed magic bytes") {
    val w = 4; val h = 2
    def ch(x: Int, y: Int) = (x * 30, y * 80 + 5, 200 - x * 20)
    val bmp = encodeBmp24(w, h, ch)
    val ppm = encodePpm(w, h, ch)
    val png = encodePng(w, h, ch)
    val gif = encodeGif(w, h, ch)
    assert(decodeImage(bmp).get.luma.toSeq == decodeBmp(bmp).get.luma.toSeq)
    assert(decodeImage(ppm).get.luma.toSeq == decodePnm(ppm).get.luma.toSeq)
    assert(decodeImage(png).get.luma.toSeq == decodePng(png).get.luma.toSeq)
    assert(decodeImage(gif).get.luma.toSeq == decodeGif(gif).get.luma.toSeq)
    assert(decodeImage(bmp).get.luma.toSeq == decodeImage(ppm).get.luma.toSeq,
      "the routed formats of one image must agree")
    assert(decodeImage(bmp).get.luma.toSeq == decodeImage(png).get.luma.toSeq,
      "the PNG twin of one image must agree with its BMP")
    assert(decodeImage(bmp).get.luma.toSeq == decodeImage(gif).get.luma.toSeq,
      "the GIF twin of one image must agree with its BMP")
    assert(decodeImage("neither a bitmap nor a pixmap".getBytes).isEmpty)
    assert(decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("WAV codec: mono/stereo 16-bit and 8-bit round-trip exactly, " +
      "including the floor stereo downmix and chunk padding") {
    val n = 64
    def s16(c: Int)(i: Int) = ((i * 997 + c * 211) % 65536) - 32768
    val mono = decodeWav(encodeWav(8000, 1, n, i => Seq(s16(0)(i)))).get
    assert(mono.sampleRate == 8000 && mono.channels == 1)
    assert(mono.samples.toSeq == (0 until n).map(s16(0)),
      "mono 16-bit samples must round-trip bit-exactly")
    val st = decodeWav(encodeWav(44100, 2, n,
      i => Seq(s16(0)(i), s16(1)(i)))).get
    assert(st.samples.toSeq == (0 until n).map(i =>
      (s16(0)(i) + s16(1)(i)) >> 1),
      "stereo downmix must be the floor average")
    val u8 = decodeWav(encodeWav(8000, 1, n, i => Seq((i * 7) % 256),
      bits = 8)).get
    assert(u8.samples.toSeq == (0 until n).map(i => (i * 7) % 256 - 128),
      "8-bit unsigned samples must center to v - 128")
    // an odd-size ancillary chunk before data: the walk must honor the
    // even-padding rule or every later offset shifts by one
    val base = encodeWav(8000, 1, n, i => Seq(s16(0)(i)))
    val extra = new Array[Byte](8 + 3 + 1) // "junk" + size 3 + pad
    "junk".getBytes("US-ASCII").copyToArray(extra, 0)
    extra(4) = 3 // LE32 size = 3 (odd)
    val padded = base.take(12) ++ extra ++ base.drop(12)
    assert(decodeWav(padded).get.samples.toSeq == mono.samples.toSeq,
      "an odd-size ancillary chunk broke the padded walk")
  }

  test("WAV codec: bad magic, float/compressed formats, other widths, " +
      ">2 channels, lying sizes, and data-before-fmt decode to None") {
    val ok = encodeWav(8000, 1, 16, i => Seq(i * 100))
    assert(decodeWav(ok).nonEmpty)
    assert(decodeWav("RIFFxxxxAIFF".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(decodeWav(ok.take(20)).isEmpty, "truncated header")
    assert(decodeWav(ok.take(ok.length - 1)).isEmpty,
      "a data chunk longer than the payload must be refused")
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val b = ok.clone(); f(b); b
    }
    assert(decodeWav(mut(_(20) = 3)).isEmpty,
      "float format with a 16-bit width must be refused")
    assert(decodeWav(mut(_(20) = 2)).isEmpty, "ADPCM refused")
    assert(decodeWav(mut(_(34) = 24)).isEmpty,
      "24-bit width with a 16-bit blockAlign must be refused")
    assert(decodeWav(mut(_(22) = 3)).isEmpty, "3 channels refused")
    assert(decodeWav(mut(_(32) = 4)).isEmpty,
      "a blockAlign inconsistent with channels x width must be refused")
    // a fmt chunk claiming a hostile size: the Long walk must refuse,
    // never index past the payload
    assert(decodeWav(mut { b => b(16) = -1; b(17) = -1; b(18) = -1; b(19) = 0x7f })
      .isEmpty, "a lying fmt size must be refused")
    // data before fmt: swap the two chunks — refuse, don't guess a format
    val dataFirst = ok.take(12) ++ ok.drop(36) ++ ok.slice(12, 36)
    assert(decodeWav(dataFirst).isEmpty, "data before fmt must be refused")
    assert(decodeWav(Array.emptyByteArray).isEmpty)
  }

  test("audioReport aggregates decoded samples exactly and skips " +
      "undecodable payloads") {
    implicit val s = spark
    // one doc per format branch of the synth mix: mono16, stereo16,
    // mono24, extensible float
    val media = Seq(
      MediaRow(4L, synthWav(4L)), MediaRow(5L, synthWav(5L)),
      MediaRow(6L, synthWav(6L)), MediaRow(7L, synthWav(7L)),
      MediaRow(8L, "not audio at all, not even close padding".getBytes))
      .toDS()
    val out = audioReport(media).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(4L, 5L, 6L, 7L),
      "garbage must be skipped; every format branch must decode")
    // replay the generator arithmetic directly (the oracle's computation)
    def truth(id: Long): (Long, Long, Long, Long) = {
      def smp(c: Int)(i: Int) =
        (((id * 131 + i * 37 + c * 4099) % 65536L) - 32768L).toInt
      val xs = (id % 4) match {
        case 1 => (0 until 256).map(i => (smp(0)(i) + smp(1)(i)) >> 1)
        case 2 => (0 until 256).map(i =>
          (((id * 131 + i * 37) % 16777216L) - 8388608L).toInt)
        case _ => (0 until 256).map(smp(0)) // mono16 and exact-dyadic float
      }
      (xs.map(x => math.abs(x).toLong).sum,
        xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum,
        xs.map(x => math.abs(x).toLong).max,
        xs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
    }
    out.foreach { r =>
      val (sa, pc, pk, zc) = truth(r.doc_id)
      assert(r.sample_rate == 8000L && r.n_samples == 256L)
      assert((r.sum_abs, r.pos_checksum, r.peak, r.zero_crossings) ==
        ((sa, pc, pk, zc)), s"doc ${r.doc_id} aggregates diverged")
    }
  }

  test("WAV codec: 24-bit and IEEE-float samples decode exactly, " +
      "plainly and through the WAVE_FORMAT_EXTENSIBLE wrapper") {
    val n = 64
    // 24-bit: full signed range, both signs, both plain and extensible
    def s24(i: Int) = ((i * 97003 + 11) % 16777216) - 8388608
    for (ext <- Seq(false, true)) {
      val got = decodeWav(encodeWav(16000, 1, n, i => Seq(s24(i)),
        bits = 24, extensible = ext))
        .getOrElse(fail(s"24-bit (extensible=$ext) refused"))
      assert(got.samples.toSeq == (0 until n).map(s24),
        s"24-bit samples (extensible=$ext) must round-trip bit-exactly")
    }
    // float: exact dyadics land on their own integers; a general float
    // rounds half-up to the 16-bit grid; ±overrange clamps
    def k16(i: Int) = ((i * 997) % 65536) - 32768
    val dy = decodeWav(encodeWavFloat(8000, 1, n, i => Seq(k16(i) / 32768f)))
      .getOrElse(fail("plain float refused"))
    assert(dy.samples.toSeq == (0 until n).map(k16),
      "exact-dyadic floats must decode to their generating integers")
    val gen = decodeWav(encodeWavFloat(8000, 1, 5,
      i => Seq(Seq(0.1f, -0.9999f, 1.5f, -2.0f, 3.0517578e-5f)(i)))).get
    assert(gen.samples.toSeq == Seq(0.1f, -0.9999f, 1.5f, -2.0f,
      3.0517578e-5f).map(v =>
      math.min(32767, math.max(-32768, math.round(v * 32768f)))),
      "general floats must round to the clamped 16-bit grid")
    // stereo float downmix happens AFTER the per-channel rounding
    val sf = decodeWav(encodeWavFloat(8000, 2, n,
      i => Seq(k16(i) / 32768f, -k16(i) / 65536f))).get
    assert(sf.samples.toSeq == (0 until n).map { i =>
      val r = math.round(-k16(i) / 65536f * 32768f)
      (k16(i) + r) >> 1
    }, "stereo float downmix must floor-average the rounded channels")
    // extensible 16-bit PCM decodes identically to the plain layout
    val plain = decodeWav(encodeWav(8000, 1, n, i => Seq(k16(i)))).get
    val wrapped = decodeWav(encodeWav(8000, 1, n, i => Seq(k16(i)),
      extensible = true)).getOrElse(fail("extensible PCM refused"))
    assert(wrapped.samples.toSeq == plain.samples.toSeq)
    // a NaN or infinite sample poisons the whole payload
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity))
      assert(decodeWav(encodeWavFloat(8000, 1, 4,
        i => Seq(if (i == 2) bad else 0.5f))).isEmpty,
        s"a $bad sample must refuse the payload")
    // hostile extensible headers: wrong GUID tail, truncated fmt, bad
    // cbSize, and a float GUID over a 16-bit layout
    val okExt = encodeWav(8000, 1, n, i => Seq(k16(i)), extensible = true)
    def mutE(f: Array[Byte] => Unit): Array[Byte] = {
      val b = okExt.clone(); f(b); b
    }
    assert(decodeWav(mutE(_(50) = 0x11)).isEmpty, "a wrong GUID refused")
    assert(decodeWav(mutE(_(36) = 7)).isEmpty, "cbSize < 22 refused")
    assert(decodeWav(mutE(_(44) = 3)).isEmpty,
      "a float SubFormat over a 16-bit PCM layout must refuse")
    assert(decodeWav(mutE { b => b(16) = 16; b(17) = 0 }).isEmpty,
      "extensible with a 16-byte fmt chunk is structurally a lie")
  }

  test("WAV codec: 24-bit and stereo decodes cross-check against the " +
      "JDK's javax.sound on the same bytes") {
    val n = 48
    def s24(i: Int) = ((i * 97003 + 11) % 16777216) - 8388608
    def s16(c: Int)(i: Int) = ((i * 997 + c * 211) % 65536) - 32768
    for ((desc, bytes, bits, chs) <- Seq(
        ("mono-24", encodeWav(16000, 1, n, i => Seq(s24(i)), bits = 24),
          24, 1),
        ("stereo-16", encodeWav(44100, 2, n, i => Seq(s16(0)(i), s16(1)(i))),
          16, 2))) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      assert(f.getChannels == chs && f.getSampleSizeInBits == bits,
        s"$desc: the JDK parsed a different format")
      val raw = ais.readAllBytes()
      val bpc = bits / 8
      def jdkSample(frame: Int, c: Int): Int = {
        val off = frame * f.getFrameSize + c * bpc
        if (bits == 16) (raw(off) & 0xff) | (raw(off + 1) << 8)
        else (raw(off) & 0xff) | ((raw(off + 1) & 0xff) << 8) |
          (raw(off + 2) << 16)
      }
      val ours = decodeWav(bytes).getOrElse(fail(s"$desc: our decode failed"))
      (0 until n).foreach { i =>
        val want =
          if (chs == 1) jdkSample(i, 0)
          else (jdkSample(i, 0) + jdkSample(i, 1)) >> 1
        assert(ours.samples(i) == want, s"$desc: frame $i diverged")
      }
    }
  }

  test("videoSceneCuts pairs consecutive decoded frames with exact SAD, " +
      "skips dropped frames, and thresholds the cut flag") {
    implicit val s = spark
    val w = 15; val h = 9; val n = 5
    def ch(f: Int)(x: Int, y: Int) =
      ((f * 41 + x * 31 + y * 7) % 256, (f * 43 + x * 13 + y * 101) % 256,
        (f * 47 + x + y * 3) % 256)
    val avi = encodeAvi(w, h, n, ch)
    def lumaOf(f: Int) = decodeBmp(encodeBmp24(w, h, ch(f))).get.luma
    def sadOf(a: Int, b: Int) =
      lumaOf(a).zip(lumaOf(b)).map { case (p, q) => math.abs(p - q).toLong }.sum
    val thr = sadOf(1, 0) // boundary: sad >= threshold IS a cut
    val media = Seq(
      MediaRow(1L, avi),
      MediaRow(2L, "not a container of anything".getBytes)).toDS()
    val out = videoSceneCuts(media, threshold = thr).collect()
      .sortBy(_.frame_id)
    assert(out.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(out.map(r => (r.frame_id, r.prev_frame_id)).toSeq ==
      (1 until n).map(f => (f.toLong, f.toLong - 1)),
      "every consecutive pair must appear exactly once")
    out.foreach { r =>
      val sad = sadOf(r.frame_id.toInt, r.prev_frame_id.toInt)
      assert(r.sad == sad, s"frame ${r.frame_id} SAD diverged")
      assert(r.is_cut == (if (sad >= thr) 1L else 0L))
    }
    assert(out.head.is_cut == 1L, "the boundary value must flag as a cut")
    // an MJPEG container with ONE corrupt frame: the pairing skips it
    // and its neighbors pair with each other
    def tile(f: Int)(bx: Int, by: Int) = (f * 50 + bx * 90 + by * 40) % 256
    val mj = encodeAviMjpeg(16, 8, 4, tile)
    val v = decodeAvi(mj).get
    val broken = mj.clone()
    // corrupt frame 1's entropy segment end (still parses as a chunk)
    broken(v.frameOffsets(1) + v.frameSizes(1) - 3) = 0x13
    val got = videoSceneCuts(Seq(MediaRow(3L, broken)).toDS(), 0L).collect()
      .sortBy(_.frame_id)
    assert(got.map(r => (r.prev_frame_id, r.frame_id)).toSeq ==
      Seq((0L, 2L), (2L, 3L)),
      "a dropped frame must vanish from the pairing, not break it")
  }

  test("audioResampleReport linearly interpolates with exact floor " +
      "arithmetic, caps the tail neighbor, and skips undecodable payloads") {
    implicit val s = spark
    val n = 64
    // full signed range INCLUDING negatives: floor division (not
    // truncation) on negative interpolants is exactly what's pinned
    def smp(i: Int) = ((i * 997) % 65536) - 32768
    val media = Seq(
      MediaRow(1L, encodeWav(8000, 1, n, i => Seq(smp(i)))),
      MediaRow(2L, "not audio in any way, just padding".getBytes)).toDS()
    val out = audioResampleReport(media, dstRate = 5000).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L), "garbage must be skipped")
    val r = out.head
    val outN = n * 5000 / 8000 // 40
    assert(r.n_samples == outN && r.src_rate == 8000L && r.dst_rate == 5000L)
    // brute-force the convention
    val want = (0 until outN).map { j =>
      val t = j.toLong * 8000
      val i0 = (t / 5000).toInt
      val fr = (t % 5000).toInt
      val i1 = math.min(i0 + 1, n - 1)
      Math.floorDiv(smp(i0).toLong * (5000 - fr) + smp(i1).toLong * fr,
        5000L).toInt
    }
    assert(r.sum_abs == want.map(x => math.abs(x).toLong).sum)
    assert(r.pos_checksum ==
      want.zipWithIndex.map { case (x, j) => (j + 1).toLong * x }.sum)
    assert(r.peak == want.map(x => math.abs(x).toLong).max)
    assert(r.zero_crossings ==
      want.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
    // upsampling caps i1 at the last sample (j near the end maps past it)
    val up = audioResampleReport(
      Seq(MediaRow(3L, encodeWav(4000, 1, 4, i => Seq(i * 1000 - 1500)))).toDS(),
      dstRate = 9000).collect().head
    assert(up.n_samples == 4L * 9000 / 4000, "upsample length = n*dst/src")
    // a clip shorter than one output sample is skipped, not a crash
    assert(audioResampleReport(
      Seq(MediaRow(4L, encodeWav(8000, 1, 1, _ => Seq(5)))).toDS(),
      dstRate = 5000).collect().isEmpty)
  }

  test("thumbnailReport box-downsamples with exact floor cell boundaries, " +
      "emits only occupied cells, and skips undecodable payloads") {
    implicit val s = spark
    val media = Seq(
      MediaRow(1L, synthBmp(1L)),                      // 15 x 17
      MediaRow(2L, encodeBmp24(2, 1, (x, _) => (x * 90, 10, 10))), // sparse
      MediaRow(3L, "not an image, just padding bytes here".getBytes))
      .toDS()
    val out = thumbnailReport(media, tw = 4, th = 4).collect()
      .groupBy(_.doc_id)
    assert(out.keySet == Set(1L, 2L), "garbage must be skipped")
    // doc 1: brute-force the same cells from the decoded 15x17 luma
    val img = decodeBmp(synthBmp(1L)).get
    val want = (for (y <- 0 until 17; x <- 0 until 15) yield
      ((x * 4 / 15, y * 4 / 17), img.luma(y * 15 + x)))
      .groupBy(_._1).map { case ((cx, cy), ps) =>
        val sum = ps.map(_._2.toLong).sum
        (cx.toLong, cy.toLong, ps.size.toLong, sum, sum / ps.size)
      }.toSet
    assert(out(1L).length == 16, "a 15x17 source fills every 4x4 cell")
    assert(out(1L).map(c =>
      (c.cell_x, c.cell_y, c.n_px, c.sum_luma, c.mean_luma)).toSet == want,
      "cell aggregates diverged from the brute-force replay")
    // doc 2: a 2x1 image occupies only cells (0,0) and (2,0) — x=1 maps
    // to 1*4/2 = 2; no upscaling, no empty-cell rows
    assert(out(2L).map(c => (c.cell_x, c.cell_y)).toSet ==
      Set((0L, 0L), (2L, 0L)), "sparse images must leave gaps, not upscale")
    out(2L).foreach(c => assert(c.n_px == 1))
  }

  test("audioEnergyWindows splits at exact window boundaries including " +
      "the partial tail, and skips undecodable payloads") {
    implicit val s = spark
    val n = 70 // win 32 -> windows of 32, 32, 6
    def smp(i: Int) = ((i * 997) % 65536) - 32768
    val media = Seq(
      MediaRow(1L, encodeWav(8000, 1, n, i => Seq(smp(i)))),
      MediaRow(2L, "definitely not a RIFF payload of any kind".getBytes))
      .toDS()
    val out = audioEnergyWindows(media, win = 32).collect()
      .sortBy(r => (r.doc_id, r.window_id))
    assert(out.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(out.map(r => (r.window_id, r.n_samples)).toSeq ==
      Seq((0L, 32L), (1L, 32L), (2L, 6L)), "window split diverged")
    out.foreach { r =>
      val xs = (r.window_id.toInt * 32 until
        math.min(r.window_id.toInt * 32 + 32, n)).map(smp)
      assert(r.sum_abs == xs.map(x => math.abs(x).toLong).sum &&
        r.peak == xs.map(x => math.abs(x).toLong).max,
        s"window ${r.window_id} aggregates diverged")
    }
  }

  test("AVI codec: frame round-trip equals the per-frame BMP twin; " +
      "hostile containers decode to None") {
    val w = 15; val h = 9; val n = 5 // odd width: row padding exercised
    def ch(f: Int)(x: Int, y: Int) =
      ((f * 41 + x * 31 + y * 7) % 256, (f * 43 + x * 13 + y * 101) % 256,
        (f * 47 + x + y * 3) % 256)
    val avi = encodeAvi(w, h, n, ch)
    val v = decodeAvi(avi).getOrElse(fail("valid AVI refused"))
    assert(v.width == w && v.height == h && v.frameOffsets.length == n)
    (0 until n).foreach { f =>
      val want = decodeBmp(encodeBmp24(w, h, ch(f))).get.luma.toSeq
      assert(aviFrameLuma(avi, v.frameOffsets(f), w, h).toSeq == want,
        s"frame $f diverged from its BMP twin")
    }
    // hostile: magic, truncation anywhere, compressed stream, 32-bit
    // depth, hostile dims, missing movi
    assert(decodeAvi("RIFFxxxxWAVE".getBytes ++ avi.drop(12)).isEmpty)
    for (keep <- Seq(10, 30, 100, avi.length - 1))
      assert(decodeAvi(avi.take(keep)).isEmpty, s"truncated at $keep")
    def strfAt: Int = { // locate the strf body to corrupt its fields
      var i = 0
      while (!(avi(i) == 's' && avi(i + 1) == 't' && avi(i + 2) == 'r' &&
        avi(i + 3) == 'f')) i += 1
      i + 8
    }
    val comp = avi.clone(); comp(strfAt + 16) = 1 // biCompression = BI_RLE8
    assert(decodeAvi(comp).isEmpty, "a compressed stream must be refused")
    val d32 = avi.clone(); d32(strfAt + 14) = 32
    assert(decodeAvi(d32).isEmpty, "a 32-bit stream must be refused")
    // hostile avih dims: frames then cannot hold a full raster
    def avihAt: Int = {
      var i = 0
      while (!(avi(i) == 'a' && avi(i + 1) == 'v' && avi(i + 2) == 'i' &&
        avi(i + 3) == 'h')) i += 1
      i + 8
    }
    val big = avi.clone()
    big(avihAt + 32) = -1; big(avihAt + 33) = -1
    big(avihAt + 34) = -1; big(avihAt + 35) = 0x7f
    assert(decodeAvi(big).isEmpty, "2^31-scale dims must be refused")
    assert(decodeAvi(avi.take(12)).isEmpty)
  }

  test("AVI codec: frames wrapped in 'rec ' interleave lists decode " +
      "identically to the flat movi layout, in document order") {
    val w = 15; val h = 9; val n = 5
    def ch(f: Int)(x: Int, y: Int) =
      ((f * 41 + x * 31 + y * 7) % 256, (f * 43 + x * 13 + y * 101) % 256,
        (f * 47 + x + y * 3) % 256)
    val flat = decodeAvi(encodeAvi(w, h, n, ch))
      .getOrElse(fail("flat AVI refused"))
    val wrapped = encodeAvi(w, h, n, ch, recWrap = true)
    val v = decodeAvi(wrapped)
      .getOrElse(fail("'rec '-wrapped AVI refused — the VfW interleaved " +
        "layout must parse"))
    assert(v.frameOffsets.length == n, "every wrapped frame found")
    (0 until n).foreach { f =>
      val want = decodeBmp(encodeBmp24(w, h, ch(f))).get.luma.toSeq
      assert(aviFrameLuma(wrapped, v.frameOffsets(f), w, h).toSeq == want,
        s"wrapped frame $f out of order or corrupted")
    }
    assert(flat.width == v.width && flat.height == v.height)
  }

  test("JPEG codec: MJPEG frames without DHT decode via the Annex K " +
      "typical tables — exactly the JDK's decode of the table-carrying " +
      "bytes; standalone JPEGs still require DHT") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y,
        (((x * 131 + y * 37) % 256) << 16) |
          (((x * 29 + y * 211) % 256) << 8) | ((x * 197 + y * 73) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val full = baos.toByteArray // JDK default = the Annex K tables, as DHT
    // splice every DHT segment out (the MJPEG stream-frame convention)
    def stripDht(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(b(0)); out.write(b(1)) // SOI
      var pos = 2
      var done = false
      while (!done) {
        assert((b(pos) & 0xff) == 0xff, "marker walk lost sync")
        val m = b(pos + 1) & 0xff
        if (m == 0xda) { out.write(b, pos, b.length - pos); done = true }
        else {
          val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
          if (m != 0xc4) out.write(b, pos, 2 + len)
          pos += 2 + len
        }
      }
      out.toByteArray
    }
    val stripped = stripDht(full)
    assert(stripped.length < full.length, "the fixture carried no DHT?")
    assert(decodeJpeg(stripped).isEmpty,
      "a standalone JPEG without DHT must still refuse")
    val want = decodeJpeg(full).getOrElse(fail("the full JPEG refused"))
    val got = decodeJpeg(stripped, implicitTables = true)
      .getOrElse(fail("implicit tables did not rescue the DHT-less frame"))
    // identical entropy data + identical tables → value-identical decode;
    // any typo in the hand-typed Annex K constants breaks this exactly
    assert(got.luma.toSeq == want.luma.toSeq,
      "Annex K tables diverge from the JDK-written DHT")
    // frames that DO carry DHT are unaffected by the preset
    assert(decodeJpeg(full, implicitTables = true).get.luma.toSeq ==
      want.luma.toSeq)
    // and the composed path: an MJPEG AVI whose frames lost their DHT
    // still decodes per frame
    def tile(f: Int)(bx: Int, by: Int) = (f * 50 + bx * 90 + by * 40) % 256
    val mj = encodeAviMjpeg(16, 8, 2, tile)
    val vv = decodeAvi(mj).getOrElse(fail("MJPEG fixture refused"))
    (0 until 2).foreach { f =>
      assert(frameLuma(mj, vv, f).nonEmpty, s"MJPEG frame $f refused")
    }
  }

  test("AVI codec: frames bind to the validated video stream — a stray " +
      "other-stream chunk is ignored, a second video strl refuses") {
    val w = 15; val h = 9; val n = 5
    def ch(f: Int)(x: Int, y: Int) =
      ((f * 41 + x * 31 + y * 7) % 256, (f * 43 + x * 13 + y * 101) % 256,
        (f * 47 + x + y * 3) % 256)
    val avi = encodeAvi(w, h, n, ch)
    // rename ONE '00db' frame chunk to stream 01: the old decoder would
    // interleave it into the sequence; stream binding must drop exactly
    // it and keep the rest intact (ADVICE r13)
    def frameChunkAt(k: Int): Int = {
      var found = -1; var seen = 0; var i = 0
      while (found < 0 && i < avi.length - 4) {
        if (avi(i) == '0' && avi(i + 1) == '0' && avi(i + 2) == 'd' &&
            avi(i + 3) == 'b') {
          if (seen == k) found = i else seen += 1
        }
        i += 1
      }
      found
    }
    val strayAt = frameChunkAt(2)
    assert(strayAt > 0)
    val stray = avi.clone(); stray(strayAt + 1) = '1'
    val v = decodeAvi(stray).getOrElse(fail("stray-chunk AVI refused"))
    assert(!v.mjpeg && v.frameOffsets.length == n - 1,
      "exactly the other-stream chunk must drop")
    val keptFrames = (0 until n).filterNot(_ == 2)
    v.frameOffsets.indices.foreach { i =>
      val want = decodeBmp(encodeBmp24(w, h, ch(keptFrames(i)))).get.luma.toSeq
      assert(frameLuma(stray, v, i).get.toSeq == want,
        s"kept frame $i diverged after the stray chunk dropped")
    }
    // splice a DUPLICATE strl list into hdrl: two video streams is a
    // semantically ambiguous container — refuse, never interleave
    val kindAt = (0 until avi.length - 4).find(i =>
      avi(i) == 's' && avi(i + 1) == 't' && avi(i + 2) == 'r' &&
        avi(i + 3) == 'l').get
    val listAt = kindAt - 8
    val strlLen = 8 + java.nio.ByteBuffer.wrap(avi, listAt + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val dup = new java.io.ByteArrayOutputStream()
    dup.write(avi, 0, listAt + strlLen)
    dup.write(avi, listAt, strlLen) // the duplicate strl
    dup.write(avi, listAt + strlLen, avi.length - listAt - strlLen)
    val two = dup.toByteArray
    def bumpLe32(b: Array[Byte], off: Int, by: Int): Unit = {
      val v2 = java.nio.ByteBuffer.wrap(b, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt + by
      b(off) = (v2 & 0xff).toByte; b(off + 1) = ((v2 >> 8) & 0xff).toByte
      b(off + 2) = ((v2 >> 16) & 0xff).toByte
      b(off + 3) = ((v2 >> 24) & 0xff).toByte
    }
    bumpLe32(two, 4, strlLen) // RIFF size
    bumpLe32(two, 16, strlLen) // hdrl LIST size
    assert(decodeAvi(avi).nonEmpty, "the base fixture must stay valid")
    assert(decodeAvi(two).isEmpty,
      "two video strl lists must refuse, not interleave")
  }

  test("AVI codec: MJPEG streams decode per-frame through the JPEG " +
      "codec — exact flat-tile round-trip, corrupt frames drop alone") {
    val w = 15; val h = 9; val n = 4
    def tile(f: Int)(bx: Int, by: Int) = (f * 50 + bx * 90 + by * 40) % 256
    val avi = encodeAviMjpeg(w, h, n, tile, dri = 2)
    val v = decodeAvi(avi).getOrElse(fail("valid MJPEG AVI refused"))
    assert(v.mjpeg && v.width == w && v.height == h &&
      v.frameOffsets.length == n)
    (0 until n).foreach { f =>
      val want = for (y <- 0 until h; x <- 0 until w)
        yield tile(f)(x / 8, y / 8)
      assert(frameLuma(avi, v, f).get.toSeq == want,
        s"MJPEG frame $f diverged from its tile map")
    }
    // corrupt ONE frame's entropy data: that frame decodes to None, the
    // container and its other frames survive (decode-or-None per frame)
    val bad = avi.clone()
    bad(v.frameOffsets(1) + v.frameSizes(1) - 3) = 0x55
    val vb = decodeAvi(bad).getOrElse(fail("container must survive"))
    assert(frameLuma(bad, vb, 0).nonEmpty,
      "an intact frame must still decode")
    // frame 1 either refuses or decodes-with-damage; it must not throw —
    // and a frame whose JPEG dims lie about the container's must refuse
    frameLuma(bad, vb, 1): Unit
    // a container whose avih dims disagree with the embedded JPEG's SOF
    // dims: the container parses (dims are header-only for MJPEG) but
    // the frame must refuse the mismatch, not return a misshapen luma
    val liar = encodeAviMjpeg(w, h, 1, tile)
    assert(frameLuma(liar, decodeAvi(liar).get, 0).nonEmpty)
    val wrongDims = liar.clone()
    def avihBody: Int = {
      var i = 0
      while (!(wrongDims(i) == 'a' && wrongDims(i + 1) == 'v' &&
        wrongDims(i + 2) == 'i' && wrongDims(i + 3) == 'h')) i += 1
      i + 8
    }
    wrongDims(avihBody + 32) = (w + 1).toByte // dwWidth low byte
    decodeAvi(wrongDims).foreach { vv =>
      assert(frameLuma(wrongDims, vv, 0).isEmpty,
        "a frame whose JPEG dims disagree with the container must refuse")
    }
  }

  test("videoFrameReport routes the MJPEG half of the gate mix and " +
      "replays its tile arithmetic exactly") {
    implicit val s = spark
    val media = Seq(MediaRow(7L, synthAviMjpeg(7L))).toDS()
    val out = videoFrameReport(media, stride = 3).collect()
      .sortBy(_.frame_id)
    assert(out.map(_.frame_id).toSeq == Seq(0L, 3L, 6L))
    out.foreach { r =>
      val f = r.frame_id
      val luma = for (y <- 0 until 9; x <- 0 until 15)
        yield ((7L * 7 + f * 41 + (x / 8) * 31 + (y / 8) * 59) % 256).toInt
      assert(r.sum_luma == luma.map(_.toLong).sum &&
        r.pos_checksum == luma.zipWithIndex.map { case (l, p) =>
          (p + 1).toLong * l }.sum,
        s"MJPEG frame $f aggregates diverged")
    }
  }

  test("videoFrameReport keeps every stride-th frame only, aggregates " +
      "exactly, and skips undecodable payloads") {
    implicit val s = spark
    val media = Seq(
      MediaRow(1L, synthAvi(1L)),
      MediaRow(2L, "not a container of anything, let alone video".getBytes))
      .toDS()
    val out = videoFrameReport(media, stride = 3).collect()
      .sortBy(r => (r.doc_id, r.frame_id))
    assert(out.map(_.doc_id).distinct.toSeq == Seq(1L))
    assert(out.map(_.frame_id).toSeq == Seq(0L, 3L, 6L),
      "stride-3 over 8 frames must keep exactly 0, 3, 6")
    out.foreach { r =>
      // replay the generator arithmetic (the oracle's computation)
      val f = r.frame_id
      val luma = for (y <- 0 until 9; x <- 0 until 15) yield
        (299 * ((1L * 7 + f * 41 + x * 3 + y * 5) % 256).toInt +
          587 * ((1L * 11 + f * 43 + x * 13 + y * 17) % 256).toInt +
          114 * ((1L * 19 + f * 47 + x * 23 + y * 29) % 256).toInt) / 1000
      assert(r.width == 15L && r.height == 9L)
      assert(r.sum_luma == luma.map(_.toLong).sum &&
        r.pos_checksum == luma.zipWithIndex.map { case (l, p) =>
          (p + 1).toLong * l }.sum,
        s"frame $f aggregates diverged")
    }
  }

  test("decodeReport aggregates decoded pixels exactly and skips " +
      "undecodable payloads") {
    implicit val s = spark
    val w = 15; val h = 17
    val media = Seq(
      MediaRow(1L, synthBmp(1L)),
      MediaRow(2L, "garbage garbage garbage garbage garbage garbage".getBytes))
      .toDS()
    val out = decodeReport(media).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L), "undecodable payload must be skipped")
    val r = out.head
    // replay the generator arithmetic directly (the oracle's computation)
    val luma = for (y <- 0 until h; x <- 0 until w) yield
      (299 * ((1L * 7 + x * 3 + y * 5) % 256).toInt +
        587 * ((1L * 11 + x * 13 + y * 17) % 256).toInt +
        114 * ((1L * 19 + x * 23 + y * 29) % 256).toInt) / 1000
    assert(r.width == w && r.height == h && r.n_pixels == w * h)
    assert(r.sum_luma == luma.map(_.toLong).sum)
    assert(r.pos_checksum == luma.zipWithIndex.map { case (l, p) => (p + 1).toLong * l }.sum)
    assert(r.phash == Multimodal.lumaPhash(luma.toArray, 49))
  }

  test("resizeBytes emits exactly targetLen bytes via nearest-neighbor sampling") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh"), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "t")
      .select($"doc_id", org.apache.spark.sql.functions.encode($"t", "UTF-8").as("p"))
    val out = Multimodal.resizeBytes(df, "p", targetLen = 4)
      .select($"doc_id", org.apache.spark.sql.functions.decode($"resized", "UTF-8"))
      .as[(Long, String)].collect().toMap
    // len 8 -> indices floor(i*8/4) = 0,2,4,6 -> "aceg"
    assert(out(1L) == "aceg")
    // len 2 -> indices floor(i*2/4) = 0,0,1,1 -> "xxyy" (upsample repeats)
    assert(out(2L) == "xxyy")
    assert(out(3L) == "")
  }

  test("resizeBytes survives payloads where i*len overflows 32-bit") {
    import spark.implicits._
    // 3 MB payload at targetLen 1024: i*len peaks at 1023*3145728 ≈ 3.2e9 > 2^31.
    // The final byte of the resize must be the byte at floor(1023*len/1024),
    // which sits in the last 1/1024th of the payload — a marker region.
    val len = 3 * 1024 * 1024
    val payload = new Array[Byte](len)
    java.util.Arrays.fill(payload, len - len / 1024, len, 'Z'.toByte)
    val df = Seq((1L, payload)).toDF("doc_id", "p")
    val out = Multimodal.resizeBytes(df, "p", targetLen = 1024)
      .select($"resized").as[Array[Byte]].head()
    assert(out.length == 1024)
    assert(out.last == 'Z'.toByte)
  }

  test("phash: planted near-identical payloads pair; unrelated payloads do not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def blob(n: Int): String =
      Iterator.continually(rnd.nextPrintableChar()).filter(_.isLetterOrDigit).take(n).mkString
    val base = blob(400)
    // 1 and 2: identical; 3: one flipped char (a near-dup byte stream);
    // 4 and 5: unrelated payloads of the same length
    val rows = Seq(
      1L -> base,
      2L -> base,
      3L -> (base.substring(0, 200) + "#" + base.substring(201)),
      4L -> blob(400),
      5L -> blob(400))
    val media = rows.toDF("doc_id", "t")
      .select($"doc_id", encode($"t", "UTF-8").as("payload"))
    val pairs = Multimodal.phashPairs(media)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSeq
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)).contains(0), s"identical payloads must pair at hamming 0: $pairs")
    assert(byPair.contains((1L, 3L)) && byPair((1L, 3L)) <= 3,
      s"one-byte edit must stay within the banding's hamming budget: $pairs")
    assert(!pairs.exists(p => Set(p._1, p._2).contains(4L) && Set(p._1, p._2).contains(5L)),
      s"unrelated payloads must not pair: $pairs")
    graft.Caching.releaseAll()
  }

  test("phash is invariant to constant-factor payload scaling (NN resample)") {
    import spark.implicits._
    // the dHash property the resize-position sampling buys: the same content
    // at 2x the byte length samples the same positions and hashes identically
    val content = (0 until 200).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val doubled = content.flatMap(c => s"$c$c")
    val media = Seq(1L -> content, 2L -> doubled).toDF("doc_id", "t")
      .select($"doc_id", encode($"t", "UTF-8").as("payload"))
    val hashes = Multimodal.phash(media)
      .select($"doc_id", $"phash").as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L),
      s"2x nearest-neighbor upsample must preserve the dHash: $hashes")
  }

  test("sampleFrames keeps every stride-th fixed-width frame incl. a partial tail") {
    import spark.implicits._
    val df = Seq((1L, "AABBCCDDE"))   // frames of 2: AA BB CC DD E
      .toDF("doc_id", "t")
      .select($"doc_id", org.apache.spark.sql.functions.encode($"t", "UTF-8").as("p"))
    val out = Multimodal.sampleFrames(df, "p", frameSize = 2, stride = 2)
      .select(org.apache.spark.sql.functions.decode($"frames", "UTF-8"))
      .as[String].head()
    assert(out == "AACCE")   // frames 0, 2, 4 (the partial tail "E")
  }
}
