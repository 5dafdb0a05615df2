package graft.ext

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Round-16 media-codec optimization pins: every per-row CPU cut in
  * [[Multimodal]] (raster-direct PNG generation, reused per-thread
  * PNG reader/writer, raster-direct phash, BigInt-free 128-bit
  * compares) must leave payload BYTES and hashes bit-identical to the
  * pre-r16 constructions, re-created inline here as references.
  */
class R16MediaSpec extends SparkSpec {

  import Multimodal.{Codec, MediaGen}

  /** The pre-r16 generator: per-pixel setRGB + per-call ImageIO.write. */
  private def refPng(id: Long, frame: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = MediaGen.mix(id * 131 + frame, (y.toLong << 20) | x.toLong)
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The pre-r16 phash: per-pixel getRGB + BigInt cross-multiply. */
  private def refPhash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val areas = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val b = by * 8 + bx
        sums(b) += gray
        areas(b) += 1
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val totalArea = areas.sum
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (areas(b) > 0 &&
          BigInt(sums(b)) * totalArea > BigInt(total) * areas(b))
        hash |= (1L << b)
      b += 1
    }
    hash
  }

  // ids covering all three kinds and a negative id (floorMod arm)
  private val sampleIds = Seq(0L, 1L, 2L, 3L, 7L, 11L, 23L, 100L, -4L)

  test("MediaGen payloads are byte-identical to the pre-r16 setRGB + " +
      "ImageIO.write generator on every kind (raster fill + reused " +
      "writer change no bytes)") {
    sampleIds.foreach { id =>
      MediaGen.kindOf(id) match {
        case "image" =>
          val (w, h) = MediaGen.imageDims(id)
          assert(java.util.Arrays.equals(
            MediaGen.png(id, 0, w, h), refPng(id, 0, w, h)),
            s"image payload for id=$id diverged")
        case "video" =>
          val (w, h, nf) = MediaGen.videoParams(id)
          (0 until nf).foreach { f =>
            assert(java.util.Arrays.equals(
              MediaGen.png(id, f, w, h), refPng(id, f, w, h)),
              s"video frame $f for id=$id diverged")
          }
        case _ => // audio payloads don't touch the PNG path
      }
    }
  }

  test("decodeImage through the reused per-thread PNG reader yields " +
      "pixel-identical images to ImageIO.read, and encodePngBytes " +
      "re-encodes them to the same bytes ImageIO.write produces") {
    sampleIds.filter(id => MediaGen.kindOf(id) == "image").foreach { id =>
      val (w, h) = MediaGen.imageDims(id)
      val payload = MediaGen.png(id, 0, w, h)
      val a = Codec.decodeImage(payload)
      val b = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
      assert(a.getType == b.getType, "reused reader changed raster type")
      val pa = a.getRGB(0, 0, w, h, null, 0, w)
      val pb = b.getRGB(0, 0, w, h, null, 0, w)
      assert(java.util.Arrays.equals(pa, pb), s"pixels diverge for id=$id")
      val bos = new ByteArrayOutputStream()
      ImageIO.write(a, "png", bos)
      assert(java.util.Arrays.equals(
        Codec.encodePngBytes(a), bos.toByteArray),
        s"re-encode bytes diverge for id=$id")
    }
  }

  test("imagePhash64 raster fast paths (3BYTE_BGR decode output, " +
      "INT_RGB scaled output) and the getRGB fallback all equal the " +
      "pre-r16 getRGB+BigInt reference") {
    sampleIds.filter(id => MediaGen.kindOf(id) != "audio").foreach { id =>
      val payload = MediaGen.kindOf(id) match {
        case "image" =>
          val (w, h) = MediaGen.imageDims(id); MediaGen.png(id, 0, w, h)
        case _ => Codec.demuxVideo(MediaGen.video(id)).head
      }
      val decoded = Codec.decodeImage(payload)
      assert(decoded.getType ==
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
        "fixture decode no longer produces 3BYTE_BGR — fast path unexercised")
      assert(Multimodal.imagePhash64(decoded) == refPhash(decoded),
        s"3BYTE_BGR fast path diverges for id=$id")
      // INT_RGB copy (the scaled-image layout)
      val rgb = new java.awt.image.BufferedImage(decoded.getWidth,
        decoded.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      g.drawImage(decoded, 0, 0, null)
      g.dispose()
      assert(Multimodal.imagePhash64(rgb) == refPhash(rgb),
        s"INT_RGB fast path diverges for id=$id")
      // a layout neither fast path accepts exercises the fallback loop
      val argb = new java.awt.image.BufferedImage(decoded.getWidth,
        decoded.getHeight, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g2 = argb.createGraphics()
      g2.drawImage(decoded, 0, 0, null)
      g2.dispose()
      assert(Multimodal.imagePhash64(argb) == refPhash(argb),
        s"fallback path diverges for id=$id")
    }
  }

  test("cmp128 equals the BigInt cross-multiplication sign on random " +
      "non-negative longs including past-2^63 products") {
    val rnd = new scala.util.Random(1616)
    def draw(): Long = {
      val magnitudes = Seq(1L << 10, 1L << 20, 1L << 31, 1L << 40,
        (1L << 62) - 1)
      val m = magnitudes(rnd.nextInt(magnitudes.length))
      math.abs(rnd.nextLong() % m)
    }
    (0 until 20000).foreach { _ =>
      val (a, b, c, d) = (draw(), draw(), draw(), draw())
      val want = (BigInt(a) * BigInt(b)).compare(BigInt(c) * BigInt(d))
      val got = Multimodal.cmp128(a, b, c, d)
      assert(Integer.signum(got) == want,
        s"cmp128($a,$b,$c,$d)=$got, BigInt sign=$want")
    }
    // exact-equality corner: identical products must compare 0
    assert(Multimodal.cmp128(6L, 35L, 14L, 15L) == 0)
  }

  test("MediaGen.wav bytes through the cached WAV writer provider equal " +
      "the AudioSystem.write reference, and decodePcm16 through the " +
      "cached reader provider equals the AudioSystem path") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    sampleIds.filter(id => MediaGen.kindOf(id) == "audio").foreach { id =>
      val got = MediaGen.wav(id)
      // reference: the pre-r16 generator tail (registry-routed write)
      val (rate, n) = MediaGen.audioParams(id)
      val pcm = new Array[Byte](n * 2)
      val freq = 100.0 + java.lang.Math.floorMod(MediaGen.mix(id, 8), 900L)
      var i = 0
      while (i < n) {
        val s = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos): Unit
      assert(java.util.Arrays.equals(got, bos.toByteArray),
        s"wav bytes for id=$id diverged from the AudioSystem reference")
      // decode side: cached provider == registry route
      val a = Codec.decodePcm16(got)
      val refAis = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(got))
      val bytes = try refAis.readAllBytes() finally refAis.close()
      val want = new Array[Short](bytes.length / 2)
      var k = 0
      while (k < want.length) {
        want(k) = (((bytes(2 * k + 1) & 0xff) << 8) |
          (bytes(2 * k) & 0xff)).toShort
        k += 1
      }
      assert(java.util.Arrays.equals(a, want),
        s"PCM for id=$id diverged from the AudioSystem reference")
    }
  }

  test("audioPhash64 is unchanged by the 128-bit compare on the fixture " +
      "audio payloads (recomputed against a BigInt reference)") {
    sampleIds.filter(id => MediaGen.kindOf(id) == "audio").foreach { id =>
      val pcm = Codec.decodePcm16(MediaGen.wav(id))
      val n = pcm.length
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var i = 0
      while (i < n) {
        val w = (i.toLong * 64 / n).toInt
        val s = pcm(i).toLong
        sums(w) += s * s
        counts(w) += 1
        i += 1
      }
      val total = sums.sum
      var want = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0 && BigInt(sums(b)) * n > BigInt(total) * counts(b))
          want |= (1L << b)
        b += 1
      }
      assert(Multimodal.audioPhash64(pcm) == want,
        s"audio phash diverged for id=$id")
    }
  }
}
