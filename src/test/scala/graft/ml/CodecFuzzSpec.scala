package graft.ml

import graft.SparkSpec
import graft.ml.Multimodal._

/**
 * Fuzz soak for every binary codec's never-crash-the-batch contract: a
 * decode running inside a Spark task over a 100 TB media column WILL meet
 * arbitrarily corrupt bytes, and the one thing it must never do is throw
 * (killing the task and, after retries, the batch). The designed hostile
 * cases in [[MultimodalSpec]] pin the KNOWN traps (overflow dims, lying
 * sizes, bad CRCs); this spec throws random and adversarially-mutated
 * bytes at the same entry points — whatever they return must be `None`
 * or a structurally coherent decode, and an exception anywhere is a
 * failure by construction.
 *
 * Mutation fuzz beats pure-random fuzz here: a random blob dies at the
 * magic check, but a single byte flipped INSIDE a valid payload reaches
 * the deep parsing paths (filters, chunk walks, sample loops) with a
 * header that passed.
 */
class CodecFuzzSpec extends SparkSpec {

  private def sane(img: DecodedImage): Unit = {
    assert(img.width > 0 && img.height > 0)
    assert(img.luma.length == img.width * img.height)
    assert(img.luma.forall(l => l >= 0 && l <= 255),
      "decoded luma left the byte range")
  }

  private def saneA(a: DecodedAudio): Unit = {
    assert(a.sampleRate > 0 && a.channels >= 1 && a.channels <= 2)
    // 8/16-bit and float samples live on the 16-bit grid; 24-bit PCM
    // keeps its native signed width
    assert(a.samples.forall(s => s >= -8388608 && s <= 8388607),
      "decoded sample left the 24-bit range")
  }

  private def decodeAll(payload: Array[Byte]): Unit = {
    // every public entry point, not just the router — a format check in
    // decodeImage must not be the only thing standing between corrupt
    // bytes and a crash in the per-format codec
    decodeImage(payload).foreach(sane)
    decodeBmp(payload).foreach(sane)
    decodePnm(payload).foreach(sane)
    decodePng(payload).foreach(sane)
    decodeGif(payload).foreach(sane)
    decodeJpeg(payload).foreach(sane)
    decodeWav(payload).foreach(saneA)
    decodeAvi(payload).foreach { v =>
      assert(v.width > 0 && v.height > 0 && v.frameOffsets.nonEmpty &&
        v.frameSizes.length == v.frameOffsets.length)
      // decodeAvi's contract: every surviving frame decodes-or-Nones
      // without a crash (DIB bounds were pre-verified; an MJPEG frame
      // may refuse, never throw)
      v.frameOffsets.indices.foreach { f =>
        frameLuma(payload, v, f).foreach { luma =>
          assert(luma.length == v.width * v.height &&
            luma.forall(l => l >= 0 && l <= 255))
        }
      }
    }
  }

  /** A JDK-encoded baseline JPEG — mutation fuzz needs REAL huffman/DCT
    * structure to corrupt, which our suite has no encoder for. */
  private def jdkJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 9) << 16) | ((y * 11) << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Its progressive twin (default multi-scan script: spectral selection
    * + successive approximation) — the deepest entropy structure in the
    * suite, and the one whose corruption reaches the refinement paths. */
  private def jdkProgressiveJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 9) << 16) | ((y * 11) << 8) | (x + y))
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val out = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    out.toByteArray
  }

  for (seed <- Seq(5, 23, 91))
    test(s"random and mutated payloads never throw from any codec (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      def ch(x: Int, y: Int) =
        ((x * 31 + y * 7) % 256, (x * 13 + y * 101) % 256, (x + y * 3) % 256)
      // valid fixtures spanning every format and layout variant
      val fixtures: Seq[Array[Byte]] = Seq(
        encodeBmp24(15, 9, ch),
        encodeBmp24(15, 9, ch, topDown = true),
        encodeBmp32(15, 9, ch),
        encodeBmp8(9, 7, (x, y) => { val i = (x + y) % 8; (i * 30, i * 25, i * 20) }),
        encodePpm(7, 5, ch),
        encodePgm(7, 5, (x, y) => (x * 9 + y) % 256),
        s"P3\n7 5\n255\n${Seq.tabulate(105)(i => i % 256).mkString(" ")}\n"
          .getBytes("US-ASCII"),
        encodePbm(13, 5, (x, y) => (x + y) % 2 == 0),
        encodePbm(13, 5, (x, y) => (x * y) % 3 == 0, raw = false,
          packed = true),
        encodePng(9, 7, ch, colorType = 0),
        encodePng(9, 7, ch, colorType = 2),
        encodePng(9, 7, ch, colorType = 4),
        encodePng(9, 7, ch, colorType = 6),
        encodePng(9, 7, ch, colorType = 3),
        encodePng(9, 7, ch, colorType = 2, interlace = true),
        encodePng(9, 7, ch, colorType = 0, bitDepth = 16),
        encodePng(5, 3, (x, y) => { val i = (x + y) % 16; (i * 17, i * 5, i * 11) },
          colorType = 3, bitDepth = 4),
        encodeGif(9, 7, ch),
        encodeGif(12, 8, (x, y) => Seq((0, 0, 0), (255, 255, 255))((x + y) % 2)),
        encodeWav(8000, 1, 64, i => Seq(((i * 997) % 65536) - 32768)),
        encodeWav(8000, 2, 64, i => Seq(i * 100 - 3200, 3200 - i * 100)),
        encodeWav(8000, 1, 64, i => Seq((i * 7) % 256), bits = 8),
        encodeWav(8000, 1, 64, i => Seq(((i * 97003) % 16777216) - 8388608),
          bits = 24),
        encodeWav(8000, 2, 64, i => Seq(i * 1000 - 32000, 32000 - i * 1000),
          bits = 24, extensible = true),
        encodeWavFloat(8000, 1, 64, i => Seq((i - 32) / 64f)),
        encodeWavFloat(8000, 1, 64, i => Seq((i - 32) / 64f),
          extensible = true),
        encodeAvi(9, 5, 3, f => (x, y) => (f * 50 + x * 20, y * 40, 128)),
        // the composed container-then-JPEG path (MJPEG), and the
        // hand-rolled flat-tile JPEG with restart markers — both reach
        // entropy-decode structure the JDK fixture can't (DRI)
        encodeAviMjpeg(15, 9, 3,
          f => (bx, by) => (f * 50 + bx * 90 + by * 40) % 256, dri = 2),
        encodeJpegFlat(15, 17, (bx, by) => (bx * 60 + by * 35 + 10) % 256,
          dri = 2),
        encodeJpegFlat(15, 17, (bx, by) => (bx * 60 + by * 35 + 10) % 256,
          dri = 2, progressive = true),
        jdkJpeg(24, 18),
        jdkProgressiveJpeg(24, 18))
      fixtures.foreach(decodeAll) // the fixtures themselves are clean

      (1 to 400).foreach { _ =>
        // pure-random blobs, including empty and sub-header lengths
        decodeAll(Array.fill(rnd.nextInt(600))(rnd.nextInt(256).toByte))
        // magic-prefixed random tails: pass the router, die deeper
        val magic = Seq("BM", "P6\n", "P3\n",
          new String(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
            0x1a, 0x0a).map(_.toChar)), "RIFF", "GIF89a", "GIF87a",
          new String(Array(0xff, 0xd8, 0xff).map(_.toChar)))(
          rnd.nextInt(8))
        decodeAll(magic.map(_.toByte).toArray ++
          Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
      }
      (1 to 1200).foreach { _ =>
        val base = fixtures(rnd.nextInt(fixtures.size))
        val m = base.clone()
        rnd.nextInt(3) match {
          case 0 => // 1-4 byte flips anywhere, headers included
            (0 until 1 + rnd.nextInt(4)).foreach { _ =>
              m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
            }
            decodeAll(m)
          case 1 => // truncation at a random point
            decodeAll(m.take(rnd.nextInt(m.length)))
          case 2 => // random-garbage extension past a valid payload
            decodeAll(m ++ Array.fill(1 + rnd.nextInt(64))(
              rnd.nextInt(256).toByte))
        }
      }
    }
}
