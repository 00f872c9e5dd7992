package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Decode-kernel honesty: real container payloads must report their
  * TRUE header dimensions, not the deterministic fake.
  *
  * The PNG fixture is a genuine file (written by javax.imageio — full
  * signature/IHDR/IDAT/IEND structure, not a hand-mocked header); the
  * WAV fixture is a byte-exact canonical RIFF/WAVE PCM file built per
  * the spec. Non-media payloads must keep the fake (the oracle for
  * `mm_decode_stats` replays exactly that branch over UTF-8 blobs). */
class MultimodalSpec extends SparkSpec {

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JVM PNG writer missing")
    bos.toByteArray
  }

  /** Canonical 44-byte-header PCM WAV. */
  private def realWav(rate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until dataLen).foreach(i => bb.put((i * 13).toByte))
    bb.array()
  }

  test("PNG blob: header-parsed width/height, not the length-derived fake") {
    val png = realPng(37, 23)
    val m = Multimodal.decodeKernel(1L, "image", png)
    assert(m.width == 37 && m.height == 23 && m.n_frames == 1,
      s"got ${m.width}x${m.height}")
    assert(m.byte_len == png.length)
    // the fake would have produced these instead
    assert((m.width, m.height) !=
      ((png.length % 640 + 1).toInt, (png.length % 480 + 1).toInt) ||
      png.length % 640 + 1 == 37 && png.length % 480 + 1 == 23)
  }

  test("JPEG blob: SOF-parsed width/height from a real encoder output") {
    val img = new java.awt.image.BufferedImage(
      31, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JVM JPEG writer missing")
    val m = Multimodal.decodeKernel(7L, "image", bos.toByteArray)
    assert(m.width == 31 && m.height == 17, s"got ${m.width}x${m.height}")
  }

  test("GIF blob: screen-descriptor dims from a real encoder; block-walked frames") {
    val img = new java.awt.image.BufferedImage(
      29, 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "JVM GIF writer missing")
    val m = Multimodal.decodeKernel(8L, "image", bos.toByteArray)
    assert(m.width == 29 && m.height == 13, s"got ${m.width}x${m.height}")
    assert(m.n_frames == 1, s"frames ${m.n_frames}")
    // multi-frame: hand-assembled container (the walker needs structure,
    // not valid LZW) — 2 image descriptors, an extension to skip, no GCT
    def sub(data: Byte*): Array[Byte] =
      Array(data.length.toByte) ++ data :+ 0.toByte
    def imageDesc(w: Int, h: Int): Array[Byte] =
      Array[Byte](0x2c, 0, 0, 0, 0,
        (w & 0xff).toByte, (w >> 8).toByte, (h & 0xff).toByte, (h >> 8).toByte,
        0 /*no LCT*/, 2 /*LZW min code*/) ++ sub(1, 2, 3)
    val twoFrame =
      "GIF89a".getBytes("US-ASCII") ++
        Array[Byte](40, 0, 30, 0, 0 /*no GCT*/, 0, 0) ++
        (Array[Byte](0x21, 0xf9.toByte) ++ sub(0, 5, 0, 0)) ++ // GCE ext
        imageDesc(40, 30) ++ imageDesc(40, 30) :+ 0x3b.toByte
    val m2 = Multimodal.decodeKernel(9L, "video", twoFrame)
    assert(m2.width == 40 && m2.height == 30, s"got ${m2.width}x${m2.height}")
    assert(m2.n_frames == 2, s"frames ${m2.n_frames}")
    // the GIF magic is printable ASCII — unlike PNG/JPEG, ordinary TEXT
    // can start with it. The structural walk (NUL-terminated sub-block
    // chains + exact trailer) must reject prose so the oracle's
    // fake-branch replay stays sound for text corpora.
    val prose = "GIF89a is the 1989 revision of the image format,"
      .getBytes("UTF-8") ++ ("x" * 40).getBytes("UTF-8")
    val mp = Multimodal.decodeKernel(11L, "image", prose)
    assert(mp.width == prose.length % 640 + 1,
      "GIF-prefixed prose must use the fake branch, not header fields")
    // headerless trailer-only payload: no image descriptor -> reject
    val empty = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 10, 0, 0, 0, 0, 0x3b)
    val me = Multimodal.decodeKernel(12L, "image", empty)
    assert(me.width == empty.length % 640 + 1,
      "a GIF with no image descriptor must use the fake branch")
  }

  test("WAV blob: fmt/data-parsed rate, channels and sample frames") {
    val wav = realWav(rate = 8000, channels = 2, bitsPerSample = 16, nFrames = 50)
    val m = Multimodal.decodeKernel(2L, "audio", wav)
    assert(m.width == 8000, s"sample rate ${m.width}")
    assert(m.height == 2, s"channels ${m.height}")
    assert(m.n_frames == 50, s"frames ${m.n_frames}")
  }

  test("non-media payloads keep the deterministic fake (oracle branch)") {
    val bytes = "plain text payload, definitely not a container".getBytes("UTF-8")
    val m = Multimodal.decodeKernel(3L, "image", bytes)
    assert(m.width == bytes.length % 640 + 1)
    assert(m.height == bytes.length % 480 + 1)
    assert(m.n_frames == 1)
  }

  test("malformed near-media payloads fall back instead of crashing") {
    val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val truncated = pngSig ++ Array[Byte](0, 0, 0, 13) // signature, no IHDR
    val junkRiff = "RIFFxxxxWAVE".getBytes("US-ASCII") ++
      Array.fill[Byte](10)(0x7f)
    Seq(truncated, junkRiff, Array.emptyByteArray).foreach { b =>
      val m = Multimodal.decodeKernel(4L, "audio", b)
      assert(m.width == b.length % 640 + 1, "must use the fake branch")
    }
  }

  test("fuzz: decode kernel never throws on adversarial near-media bytes") {
    // a partition kernel that throws kills the whole job at scale —
    // random payloads behind each magic must always fall through or
    // parse, never crash
    val rnd = new scala.util.Random(99L)
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "RIFF".getBytes("US-ASCII"),
      "RIFFxxxxWAVE".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "GIF89a".getBytes("US-ASCII"),
      "GIF87a".getBytes("US-ASCII"),
      Array.emptyByteArray)
    (0 until 300).foreach { i =>
      val magic = magics(i % magics.length)
      val body = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt.toByte)
      val m = Multimodal.decodeKernel(i.toLong, "image", magic ++ body)
      assert(m.byte_len == magic.length + body.length)
      assert(m.width >= 1 && m.height >= 1 && m.n_frames >= 0)
    }
    // targeted: a fmt chunk whose LE32 sample rate exceeds Int.MaxValue
    // must fall back, not wrap negative through toInt
    val hugeRate = java.nio.ByteBuffer.allocate(36)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(28)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(0x80000001) // rate = 2^31 + 1 unsigned
      .putInt(0).putShort(2).putShort(16).array()
    val hm = Multimodal.decodeKernel(9L, "audio", hugeRate)
    assert(hm.width == hugeRate.length % 640 + 1, "must use the fake branch")
    // targeted: a fmt chunk DECLARING size < 16 must not have its
    // channels/rate read from the following chunk's bytes — the walker
    // must skip it (declared size governs the cursor) and fall back
    val shortFmt = java.nio.ByteBuffer.allocate(12 + 8 + 12 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(48)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(12) // declares only 12 bytes
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .put("data".getBytes("US-ASCII")).putInt(16)
      .put(Array.fill[Byte](16)(7)).array()
    val sm = Multimodal.decodeKernel(10L, "audio", shortFmt)
    assert(sm.width == shortFmt.length % 640 + 1,
      "truncated fmt chunk must use the fake branch, not garbage fields")
  }

  // ---- real PNG PIXEL decode (r11): Inflater + defilter + palette ----

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tag.getBytes("US-ASCII"))
    crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array
  }

  /** Hand-built minimal grayscale PNG around pre-filtered scanlines —
    * independent of any encoder, so each of the five row filters can be
    * exercised deliberately. */
  private def grayPng(w: Int, h: Int, rawScanlines: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte) // depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte).array
    val defl = new java.util.zip.Deflater()
    defl.setInput(rawScanlines)
    defl.finish()
    val buf = new Array[Byte](rawScanlines.length + 128)
    val n = defl.deflate(buf)
    defl.end()
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("PNG pixels: bit-exact decode vs the independent JVM encoder") {
    val w = 37; val h = 23
    val png = realPng(w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val p = Multimodal.decodePngPixels(png).getOrElse(
      fail("supported-profile PNG did not decode"))
    assert(p.width == w && p.height == h && p.channels == 3)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((p.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
          (p.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (p.pixels(o + 2) & 0xff) == (rgb & 0xff),
          s"pixel ($x,$y) diverged from ImageIO")
      }
    }
  }

  test("PNG pixels: all five row filters reverse to hand-computed values") {
    // 3x5 gray, one row per filter type; expected values worked out by
    // hand from PNG spec §9 (Sub/Up/Average/Paeth recurrences)
    val raw = Array[Int](
      0, 10, 20, 30, // None
      1, 5, 5, 5, // Sub: cumulative left
      2, 1, 2, 3, // Up
      3, 4, 6, 8, // Average
      4, 2, 2, 2 // Paeth
    ).map(_.toByte)
    val p = Multimodal.decodePngPixels(grayPng(3, 5, raw)).getOrElse(
      fail("hand-built gray PNG did not decode"))
    val expected = Array(
      10, 20, 30,
      5, 10, 15,
      6, 12, 18,
      7, 15, 24,
      9, 17, 26)
    assert(p.channels == 1)
    assert(p.pixels.map(_ & 0xff).toSeq == expected.toSeq)
  }

  test("PNG pixels: mean-pixel stats match a hand-computed value end-to-end") {
    // 16x16 gray ramp holding every byte value exactly once: mean is
    // exactly 127.5, the 8-bucket histogram is uniform (32 per bucket),
    // entropy is ln 8 — all hand-derivable without running the decoder
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(x => (0 until 16).foreach(y =>
      img.getRaster.setSample(x, y, 0, x * 16 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray
    val p = Multimodal.decodePngPixels(png).getOrElse(
      fail("gray ramp PNG did not decode"))
    assert(p.pixels.length == 256)
    assert(p.pixels.map(_ & 0xff).sorted.toSeq == (0 until 256))
    assert(p.pixels.map(v => (v & 0xff).toDouble).sum / 256 == 127.5)
    val s = spark; import s.implicits._
    val feats = Multimodal.extractFeatures(spark,
        Seq((7L, "image", png)).toDF("doc_id", "media_type", "blob"))
      .collect().head
    assert(feats.features.forall(f => math.abs(f - 0.125) < 1e-15),
      s"histogram over DECODED pixels must be uniform: ${feats.features.toSeq}")
    assert(math.abs(feats.entropy - math.log(8.0)) < 1e-12)
  }

  test("PNG pixels: phash rides the real luma grid; fakes keep their branch") {
    val s = spark; import s.implicits._
    val png = realPng(40, 30)
    val expected = Multimodal.aHashBytes(Multimodal.lumaGrid8(
      Multimodal.decodePngPixels(png).get))
    val rows = Seq((0L, "image", png),
      (1L, "image", "plain text payload".getBytes("UTF-8")))
    val got = Multimodal.perceptualHashes(spark,
        rows.toDF("doc_id", "media_type", "blob"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == expected)
    // the text payload must keep the deterministic token-slot fake
    // (same value the mm_phash oracles replay)
    assert(got(1L) != expected)
  }

  test("PNG pixels: outside-profile and corrupt streams fall back to None") {
    val png = realPng(20, 20)
    // truncate inside IDAT: header still parses, pixels must not
    val cut = png.take(png.length - 24)
    assert(Multimodal.decodePngPixels(cut).isEmpty)
    assert(Multimodal.parsePngHeader(cut).nonEmpty)
    // flip the interlace byte: profile rejection, not a crash
    val inter = png.clone(); inter(28) = 1
    assert(Multimodal.decodePngPixels(inter).isEmpty)
    // garbage IDAT bytes: DataFormatException path
    val garbled = png.clone()
    val idatAt = (0 until garbled.length - 4).find(i =>
      garbled(i) == 'I' && garbled(i + 1) == 'D' && garbled(i + 2) == 'A' &&
        garbled(i + 3) == 'T').get
    (4 until 12).foreach(k => garbled(idatAt + k) = 0x55)
    assert(Multimodal.decodePngPixels(garbled).isEmpty)
    assert(Multimodal.decodePngPixels("GIF89a not a png".getBytes).isEmpty)
  }

  test("fuzz: pixel decoder never throws on mutated or random streams") {
    val rnd = new scala.util.Random(41)
    val base = realPng(24, 16)
    (0 until 300).foreach { i =>
      val b = base.clone()
      // mutate 1-8 bytes anywhere (signature, lengths, IDAT, filters)
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextBoolean()) b.take(8 + rnd.nextInt(b.length - 8))
        else b
      Multimodal.decodePngPixels(cut) match {
        case Some(p) =>
          // a surviving decode must be internally consistent
          assert(p.pixels.length == p.width * p.height * p.channels,
            s"iteration $i: inconsistent decode")
        case None => () // rejected to the fake branch — fine
      }
    }
    (0 until 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      Multimodal.decodePngPixels(junk) // must not throw
    }
  }

  /** Real GIF via the JDK's own encoder (indexed image -> ImageIO
    * "gif"): the decode ground truth is ImageIO's reader, an
    * independent LZW implementation. */
  private def realGif(w: Int, h: Int, seed: Int = 7): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val rnd = new scala.util.Random(seed)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, rnd.nextInt(0x1000000))))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    bos.toByteArray
  }

  test("GIF pixels: bit-exact LZW decode vs ImageIO") {
    val w = 41; val h = 19
    val gif = realGif(w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    val p = Multimodal.decodeGifPixels(gif).getOrElse(
      fail("encoder-produced GIF did not decode"))
    assert(p.width == w && p.height == h && p.channels == 3)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((p.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
          (p.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (p.pixels(o + 2) & 0xff) == (rgb & 0xff),
          s"pixel ($x,$y) diverged from ImageIO")
      }
    }
    // the combined seam picks it up too
    assert(Multimodal.decodePixels(gif).nonEmpty)
  }

  test("GIF pixels: mean-pixel stats match a hand-computed value end-to-end") {
    // 16x16 gray ramp, every byte value once: mean 127.5 per channel,
    // uniform 8-bucket histogram, entropy ln 8 — same hand-derivable
    // contract as the PNG ramp, through the GIF LZW path
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(x => (0 until 16).foreach(y =>
      img.getRaster.setSample(x, y, 0, x * 16 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val gif = bos.toByteArray
    val p = Multimodal.decodeGifPixels(gif).getOrElse(
      fail("gray ramp GIF did not decode"))
    assert(p.channels == 3 && p.pixels.length == 768)
    // gray palette: each pixel's three channels agree; all 256 values
    val grays = (0 until 256).map(i => p.pixels(3 * i) & 0xff)
    assert((0 until 256).forall(i =>
      p.pixels(3 * i) == p.pixels(3 * i + 1) &&
        p.pixels(3 * i) == p.pixels(3 * i + 2)))
    assert(grays.sorted == (0 until 256))
    assert(grays.map(_.toDouble).sum / 256 == 127.5)
    val s = spark; import s.implicits._
    val feats = Multimodal.extractFeatures(spark,
        Seq((7L, "image", gif)).toDF("doc_id", "media_type", "blob"))
      .collect().head
    assert(feats.features.forall(f => math.abs(f - 0.125) < 1e-15),
      s"histogram over DECODED pixels must be uniform: ${feats.features.toSeq}")
    assert(math.abs(feats.entropy - math.log(8.0)) < 1e-12)
  }

  /** Minimal hand-rolled GIF encoder: every literal is preceded by a
    * clear code, so the dictionary never grows and the code width stays
    * mcs+1 — a VALID (if inefficient) LZW stream whose byte layout is
    * fully hand-controlled, which is what lets the interlace flag be
    * exercised deliberately (ImageIO's writer does not expose it). */
  private def handGif(w: Int, h: Int, idx: Array[Int], mcs: Int,
      interlaced: Boolean, trailingClears: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (mcs - 1)) // GCT present, 2^mcs entries
    out.write(0); out.write(0)
    (0 until (1 << mcs)).foreach { i => // gray palette g = i * step
      val g = i * (255 / ((1 << mcs) - 1))
      out.write(g); out.write(g); out.write(g)
    }
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(mcs) // LZW minimum code size
    val clear = 1 << mcs; val eoi = clear + 1; val width = mcs + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    idx.foreach { i => emit(clear); emit(i) }
    // spec-legal: an encoder may reset the dictionary after the last
    // pixel code — exercises the plane-full CLEAR-before-EOI path
    (0 until trailingClears).foreach(_ => emit(clear))
    emit(eoi)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var o = 0
    while (o < data.length) { // 255-byte sub-blocks
      val n = math.min(255, data.length - o)
      out.write(n); out.write(data, o, n); o += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  test("GIF pixels: interlaced stream reorders rows; KwKwK streams decode") {
    // 4 wide x 8 tall, row y filled with index y; rows stored in
    // interlace order (0,4,2,6,1,3,5,7 for h=8 -> passes 0/8,4/8,2/4,1/2)
    val order = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val stored = order.flatMap(y => Array.fill(4)(y)).toArray
    val gif = handGif(4, 8, stored, mcs = 3, interlaced = true)
    val p = Multimodal.decodeGifPixels(gif).getOrElse(
      fail("hand-built interlaced GIF did not decode"))
    val step = 255 / 7
    (0 until 8).foreach { y =>
      (0 until 4).foreach { x =>
        assert((p.pixels((y * 4 + x) * 3) & 0xff) == y * step,
          s"row $y not deinterlaced to its display position")
      }
    }
    // KwKwK: the code-equals-next-free case via ImageIO cross-check —
    // repetitive rows make the encoder hit it
    val rep = new java.awt.image.BufferedImage(
      64, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    (0 until 64).foreach(x => (0 until 8).foreach(y =>
      rep.setRGB(x, y, if (((x / 3) + y) % 2 == 0) 0xffffff else 0)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rep, "gif", bos))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val q = Multimodal.decodeGifPixels(bos.toByteArray).getOrElse(
      fail("repetitive GIF did not decode"))
    (0 until 8).foreach(y => (0 until 64).foreach { x =>
      assert((q.pixels((y * 64 + x) * 3) & 0xff) == ((img.getRGB(x, y) >> 16) & 0xff))
    })
  }

  test("GIF pixels: CLEAR between last pixel and EOI is spec-legal and decodes") {
    // a dictionary reset emitted at plane-full (last pixel already
    // out) must not knock the file onto the fake branch — the decoder
    // accepts CLEAR* then EOI/stream-end there
    val idx = Array.tabulate(4 * 2)(i => i % 4)
    val plain = handGif(4, 2, idx, mcs = 2, interlaced = false)
    val p0 = Multimodal.decodeGifPixels(plain).getOrElse(
      fail("baseline hand GIF did not decode"))
    Seq(1, 3).foreach { n =>
      val gif = handGif(4, 2, idx, mcs = 2, interlaced = false,
        trailingClears = n)
      val p = Multimodal.decodeGifPixels(gif).getOrElse(
        fail(s"GIF with $n trailing CLEAR(s) before EOI did not decode"))
      assert(p.pixels.sameElements(p0.pixels),
        "trailing CLEARs must not change decoded pixels")
    }
    // (the fuzz test below covers the reject path — a non-CLEAR,
    // non-EOI code at plane-full still desyncs to None)
  }

  test("fuzz: GIF decoder never throws on mutated or random LZW streams") {
    val rnd = new scala.util.Random(43)
    val base = realGif(24, 16, seed = 9)
    (0 until 300).foreach { i =>
      val b = base.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextBoolean()) b.take(6 + rnd.nextInt(b.length - 6))
        else b
      Multimodal.decodeGifPixels(cut) match {
        case Some(p) =>
          assert(p.pixels.length == p.width * p.height * p.channels,
            s"iteration $i: inconsistent decode")
        case None => ()
      }
    }
    (0 until 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      Multimodal.decodeGifPixels(junk) // must not throw
    }
    // printable magic: ordinary text starting with the signature keeps
    // the fake branch (what the mm_* oracle replays rely on)
    assert(Multimodal.decodeGifPixels("GIF89a ordinary text".getBytes).isEmpty)
  }

  /** WAV through the INDEPENDENT JDK encoder (javax.sound.sampled) —
    * the PNG/GIF-vs-ImageIO discipline for audio: our decoder must
    * return bit-exactly the samples AudioSystem encoded. */
  private def jdkWav(samples: Array[Short], channels: Int, rate: Float): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
      /*signed*/ true, /*bigEndian*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV samples: bit-exact decode vs the JDK AudioSystem encoder") {
    val sine = Array.tabulate(400)(i =>
      (math.sin(i * 2 * math.Pi / 50) * 12000).toShort)
    val mono = Multimodal.decodeWavSamples(jdkWav(sine, 1, 8000f))
    assert(mono.exists(_.sameElements(sine)), "mono 16-bit mismatch")
    // stereo interleave survives untouched
    val stereo = Array.tabulate(200)(i => (i * 37 - 3000).toShort)
    val st = Multimodal.decodeWavSamples(jdkWav(stereo, 2, 44100f))
    assert(st.exists(_.sameElements(stereo)), "stereo 16-bit mismatch")
  }

  test("WAV samples: 8-bit unsigned widens per the PCM convention") {
    val wav8 = realWav(8000, 1, 8, 5) // data bytes are (i * 13).toByte
    val got = Multimodal.decodeWavSamples(wav8)
    val expect = Array.tabulate(5)(i =>
      ((((i * 13).toByte & 0xff) - 128) << 8).toShort)
    assert(got.exists(_.sameElements(expect)), s"got $got")
  }

  test("WAV samples: features and phash ride the decoded amplitudes") {
    val s = spark; import s.implicits._
    // half silence, half loud square wave: the envelope thumbnail's
    // first 32 cells sit below the mean, the last 32 above -> aHash
    // must be exactly the high-32-bits mask; the amplitude histogram
    // must concentrate in the silence buckets (3,4) + the square's
    // extremes, NOT the container-byte distribution
    val samples = Array.tabulate(6400)(i =>
      if (i < 3200) 0.toShort
      else if ((i / 25) % 2 == 0) 20000.toShort else (-20000).toShort)
    val wav = jdkWav(samples, 1, 8000f)
    val grid = Multimodal.envelopeGrid64(samples)
    assert(grid.take(32).forall(_ == 0) && grid.drop(32).forall(b => (b & 0xff) > 100))
    val df = Seq((7L, "audio", wav)).toDF("doc_id", "media_type", "blob")
    val ph = Multimodal.perceptualHashes(spark, df).collect().head.getLong(2)
    assert(ph == (0xFFFFFFFFL << 32), f"envelope hash $ph%016x")
    val feats = Multimodal.extractFeatures(spark, df).collect().head
    // hand-computed: silence -> bucket 4 ((0+32768)>>8 = 128 -> >>5 = 4);
    // +20000 -> bucket 6; -20000 -> bucket 1; square halves split evenly
    assert(math.abs(feats.features(4) - 0.5) < 1e-9, feats.features.mkString(","))
    assert(math.abs(feats.features(6) - 0.25) < 1e-9)
    assert(math.abs(feats.features(1) - 0.25) < 1e-9)
  }

  test("WAV samples: non-PCM, odd widths, truncation and misalignment reject") {
    val good = jdkWav(Array.tabulate(100)(i => (i * 7).toShort), 1, 8000f)
    assert(Multimodal.decodeWavSamples(good).nonEmpty)
    // truncated data chunk: declared size no longer contained
    assert(Multimodal.decodeWavSamples(good.dropRight(3)).isEmpty)
    // float PCM (format tag 3) must reject even with a valid layout
    val f = good.clone()
    val fmtOff = 12 + 8 // "fmt " tag + size -> tag field
    f(fmtOff) = 3
    assert(Multimodal.decodeWavSamples(f).isEmpty)
    // 24-bit: outside the supported {8, 16}
    val w24 = realWav(8000, 1, 24, 4)
    assert(Multimodal.decodeWavSamples(w24).isEmpty)
    // adversarial fuzz: random + mutated streams never throw
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val m = good.clone()
      (0 until 8).foreach(_ => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      Multimodal.decodeWavSamples(m)
      Multimodal.decodeWavSamples(
        Array.fill(rnd.nextInt(256))(rnd.nextInt(256).toByte))
    }
    // printable prefix on ordinary text keeps the fake branch
    assert(Multimodal.decodeWavSamples("RIFFxxxxWAVE just text".getBytes).isEmpty)
  }

  test("decodeMeta end-to-end: real media and text blobs in one frame") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (0L, "image", realPng(64, 48)),
      (1L, "audio", realWav(44100, 1, 16, 100)),
      (2L, "image", "not media".getBytes("UTF-8")))
    val meta = Multimodal.decodeMeta(spark,
        rows.toDF("doc_id", "media_type", "blob"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(0L).width == 64 && meta(0L).height == 48)
    assert(meta(1L).width == 44100 && meta(1L).n_frames == 100)
    assert(meta(2L).width == ("not media".getBytes("UTF-8").length % 640 + 1))
  }
}
