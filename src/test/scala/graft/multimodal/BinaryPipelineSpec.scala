package graft.multimodal

import graft.SparkSpec

class BinaryPipelineSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val rows = media.collect()
    assert(rows.length == graft.sources.Tables.documents(spark, sf001).count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video")(r.media_type))
      assert(r.payload.length.toLong == r.n_bytes)
    }
  }

  test("feature extraction is deterministic over mapPartitions batches") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val f1 = BinaryPipeline.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = BinaryPipeline.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    f1.foreach { f =>
      assert(f.width >= 1 && f.height >= 1 && f.n_frames >= 1)
      if (f.media_type == "image") assert(f.n_frames == 1)
    }
  }

  test("image branch decodes real pixels end-to-end (PNG and BMP via ImageIO)") {
    import spark.implicits._
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-trivial pixel so the file isn't degenerate
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
      baos.toByteArray
    }
    val png = encoded("png", 37, 21)
    val bmp = encoded("bmp", 5, 9)
    val media = Seq(
      BinaryPipeline.MediaRecord(1L, "image", png, "test", png.length.toLong),
      BinaryPipeline.MediaRecord(2L, "image", bmp, "test", bmp.length.toLong),
      // audio payload stays on the stub path
      BinaryPipeline.MediaRecord(3L, "audio", png, "test", png.length.toLong)
    ).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).width == 37 && f(1L).height == 21 && f(1L).n_frames == 1)
    assert(f(2L).width == 5 && f(2L).height == 9)
    // stub dimensions are byte-derived, not pixel-derived
    assert(f(3L).width == math.max(1, (png.length % 1024)))
  }

  test("unparseable image bytes fall back to the stub instead of failing") {
    import spark.implicits._
    val junk = "definitely not an image".getBytes("UTF-8")
    val media = Seq(
      BinaryPipeline.MediaRecord(9L, "image", junk, "test", junk.length.toLong)).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect().head
    assert(f.width == junk.length && f.n_frames == 1)
  }

  test("recognized-but-corrupt image bytes fall back instead of killing the job") {
    import spark.implicits._
    // valid PNG signature + truncated body: ImageIO selects the PNG
    // reader and THROWS (doesn't return null) — the dirty-corpus case
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val truncated = baos.toByteArray.take(24)
    assert(BinaryPipeline.decodeImage(truncated).isEmpty)
    val media = Seq(BinaryPipeline.MediaRecord(
      10L, "image", truncated, "test", truncated.length.toLong)).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect().head
    assert(f.width == math.max(1, truncated.length % 1024), "stub path expected")
  }

  test("audio branch decodes real WAV/AIFF headers end-to-end") {
    import spark.implicits._
    def encoded(fileType: javax.sound.sampled.AudioFileFormat.Type,
        rateHz: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      var i = 0
      while (i < nFrames) { // audible-ish ramp so the payload isn't all zeros
        pcm(i * fmt.getFrameSize) = (i % 251).toByte
        i += 1
      }
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream, fileType, baos)
      baos.toByteArray
    }
    val wav = encoded(javax.sound.sampled.AudioFileFormat.Type.WAVE, 8000f, 1, 4000)
    val aiff = encoded(javax.sound.sampled.AudioFileFormat.Type.AIFF, 44100f, 2, 441)
    assert(BinaryPipeline.decodeAudio(wav).contains(
      BinaryPipeline.AudioInfo(8000, 1, 4000L)))
    assert(BinaryPipeline.decodeAudio(wav).flatMap(_.seconds).exists(s =>
      math.abs(s - 0.5) < 1e-9))
    val media = Seq(
      BinaryPipeline.MediaRecord(20L, "audio", wav, "test", wav.length.toLong),
      BinaryPipeline.MediaRecord(21L, "audio", aiff, "test", aiff.length.toLong),
      // truncated WAV: recognized container, corrupt body → stub, not a crash
      BinaryPipeline.MediaRecord(22L, "audio", wav.take(16), "test", 16L)
    ).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(20L).width == 8000 && f(20L).height == 1 && f(20L).n_frames == 4000)
    assert(f(21L).width == 44100 && f(21L).height == 2 && f(21L).n_frames == 441)
    assert(f(22L).width == 16, "stub path expected for the truncated container")
  }

  test("resize bounds every payload and keeps metadata consistent") {
    val resized = BinaryPipeline.resize(
      BinaryPipeline.mediaTable(spark, sf001), maxBytes = 128).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.payload.length <= 128)
      assert(r.n_bytes == r.payload.length.toLong)
      assert(r.payload.length > 0)
    }
  }

  test("frame sampling emits stride-spaced frames for non-image media") {
    val media = BinaryPipeline.mediaTable(spark, sf001)
    val frames = BinaryPipeline.sampleFrames(media, stride = 64)
    val perMedia = frames.groupBy("media_id").count().collect()
    assert(perMedia.nonEmpty)
    val features = BinaryPipeline.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    perMedia.foreach { r =>
      val f = features(r.getAs[Long]("media_id"))
      assert(f.media_type != "image")
      // ceil(n_bytes / stride) frames per media
      assert(r.getAs[Long]("count") == (f.n_bytes + 63) / 64)
    }
  }

  /** Deterministic gradient test image; `seed` varies the pattern. */
  private def patternImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / w + seed * 37) % 256
      val g = (y * 255 / h + seed * 91) % 256
      val b = ((x + y) * 255 / (w + h) + seed * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("perceptual hash survives rescaling; unrelated images stay far") {
    val base = BinaryPipeline.aHash64(patternImage(64, 48, seed = 1))
    // same scene re-rendered at double resolution (a re-encode/resize)
    val scaled = BinaryPipeline.aHash64(patternImage(128, 96, seed = 1))
    val other = BinaryPipeline.aHash64(patternImage(64, 48, seed = 5))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, scaled) <= 7, s"rescale moved ${ham(base, scaled)} bits")
    assert(ham(base, other) > 7, s"unrelated images only ${ham(base, other)} bits apart")
  }

  test("image near-dup pairing finds the rescaled copy and not the stranger") {
    import spark.implicits._
    def rec(id: Long, img: java.awt.image.BufferedImage) = {
      val p = pngBytes(img)
      BinaryPipeline.MediaRecord(id, "image", p, "test", p.length.toLong)
    }
    val media = Seq(
      rec(1L, patternImage(64, 48, seed = 1)),
      rec(2L, patternImage(128, 96, seed = 1)), // rescaled near-dup of 1
      rec(3L, patternImage(64, 48, seed = 5)), // unrelated
      BinaryPipeline.MediaRecord(4L, "image", // undecodable: dropped from hashing
        "junk".getBytes("UTF-8"), "test", 4L)
    ).toDS()
    assert(BinaryPipeline.imageHashes(media).count() == 3, "junk must drop out")
    val pairs = BinaryPipeline.nearDupImages(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the rescaled pair, got $pairs")
  }

  /** A WAV clip whose loudness envelope is controlled by `seed`: 64
    * beats, beat b is a full-scale sine burst iff bit (b mod 63) of a
    * seed-derived LCG draw is set, near-silence otherwise. `gain` scales
    * every sample (a re-encode at different volume).
    */
  private def envelopeWav(seed: Long, gain: Double, nFrames: Int = 8192): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var rng = seed * 6364136223846793005L + 1442695040888963407L
    val beatOn = Array.fill(64) {
      rng = rng * 6364136223846793005L + 1442695040888963407L
      (rng >>> 60) % 2 == 0
    }
    var i = 0
    while (i < nFrames) {
      val beat = i * 64 / nFrames
      val amp = if (beatOn(beat)) 0.8 * gain else 0.01 * gain
      val s = (math.sin(i * 2 * math.Pi * 440 / 8000) * amp * 32767).toInt
        .max(-32768).min(32767)
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audio energy hash survives gain change; different envelopes stay far") {
    def hashOf(bytes: Array[Byte]): Long =
      BinaryPipeline.audioHash64(BinaryPipeline.decodePcmMono(bytes).get)
    val base = hashOf(envelopeWav(seed = 1, gain = 1.0))
    val quiet = hashOf(envelopeWav(seed = 1, gain = 0.25)) // same clip, -12 dB
    val other = hashOf(envelopeWav(seed = 9, gain = 1.0)) // different envelope
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, quiet) <= 7, s"gain change moved ${ham(base, quiet)} bits")
    assert(ham(base, other) > 7, s"unrelated clips only ${ham(base, other)} bits apart")
  }

  test("audio near-dup pairing finds the gain-adjusted copy and not the stranger") {
    import spark.implicits._
    def rec(id: Long, bytes: Array[Byte]) =
      BinaryPipeline.MediaRecord(id, "audio", bytes, "test", bytes.length.toLong)
    val media = Seq(
      rec(1L, envelopeWav(seed = 1, gain = 1.0)),
      rec(2L, envelopeWav(seed = 1, gain = 0.25)), // same clip, quieter
      rec(3L, envelopeWav(seed = 9, gain = 1.0)), // unrelated clip
      rec(4L, Array[Byte](1, 2, 3, 4)) // undecodable: dropped from hashing
    ).toDS()
    assert(BinaryPipeline.audioHashes(media).count() == 3, "junk must drop out")
    val pairs = BinaryPipeline.nearDupAudio(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the gain-adjusted pair, got $pairs")
  }

  /** Minimal Motion-JPEG AVI: RIFF(AVI ) wrapping a LIST(movi) of
    * `00dc` chunks, one JPEG-encoded frame each, even-padded — the
    * container shape `demuxMjpeg` parses.
    */
  private def mjpegAvi(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos), "no jpg writer")
      baos.toByteArray
    }
    def le32(n: Int): Array[Byte] =
      Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.map(jpeg).foreach { c =>
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(c.length))
      movi.write(c)
      if (c.length % 2 == 1) movi.write(0)
    }
    val list = movi.toByteArray
    val body = new java.io.ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII"))
    body.write(le32(list.length))
    body.write(list)
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(payload.length))
    out.write(payload)
    out.toByteArray
  }

  test("video branch demuxes a real MJPEG AVI end-to-end") {
    import spark.implicits._
    val avi = mjpegAvi((0 until 6).map(i => patternImage(48, 32, seed = i)))
    val media = Seq(
      BinaryPipeline.MediaRecord(1L, "video", avi, "test", avi.length.toLong),
      BinaryPipeline.MediaRecord(2L, "video", // not a video container: stub path
        "not an avi at all".getBytes("UTF-8"), "test", 17L)
    ).toDS()
    assert(BinaryPipeline.demuxMjpeg(avi).length == 6)
    val f = BinaryPipeline.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).width == 48 && f(1L).height == 32 && f(1L).n_frames == 6,
      s"real decode expected, got ${f(1L)}")
    assert(f(2L).width == 17 && f(2L).n_frames == (17 / 64).max(1), "stub fallback")
  }

  test("truncated AVI keeps parsed frames and never throws") {
    val avi = mjpegAvi((0 until 4).map(i => patternImage(32, 24, seed = i)))
    // cut mid-way through the last chunk: parser must stop cleanly
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 10)
    val frames = BinaryPipeline.demuxMjpeg(cut)
    assert(frames.length == 3, s"expected the 3 intact frames, got ${frames.length}")
    assert(BinaryPipeline.demuxMjpeg("RIFF".getBytes("US-ASCII")).isEmpty)
  }

  /** Animated GIF via the JDK's own writer — a real multi-frame GIF
    * stream (writeToSequence), no native deps.
    */
  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("animated GIF decodes as a real video container end-to-end") {
    import spark.implicits._
    val gif = animatedGif((0 until 5).map(i => patternImage(40, 30, seed = i)))
    assert(BinaryPipeline.gifFrames(gif).length == 5)
    assert(BinaryPipeline.gifFrameCount(gif).contains(5))
    assert(BinaryPipeline.gifFrames("GIF89a-but-junk".getBytes("UTF-8")).isEmpty)
    assert(BinaryPipeline.gifFrames(Array[Byte](1, 2, 3)).isEmpty)
    val media = Seq(
      BinaryPipeline.MediaRecord(1L, "video", gif, "test", gif.length.toLong)).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect().head
    assert(f.width == 40 && f.height == 30 && f.n_frames == 5,
      s"real GIF decode expected, got $f")
  }

  test("GIF and MJPEG encodings of the same clip are near-dups") {
    import spark.implicits._
    val frames = (0 until 8).map(i => patternImage(64, 48, seed = 100 + i))
    def rec(id: Long, bytes: Array[Byte]) =
      BinaryPipeline.MediaRecord(id, "video", bytes, "test", bytes.length.toLong)
    val media = Seq(
      rec(1L, mjpegAvi(frames)),
      rec(2L, animatedGif(frames)), // same scenes, different container+codec
      rec(3L, animatedGif((0 until 8).map(i => patternImage(64, 48, seed = 900 + i))))
    ).toDS()
    assert(BinaryPipeline.videoHashes(media).count() == 3)
    val pairs = BinaryPipeline.nearDupVideo(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the cross-container pair, got $pairs")
  }

  /** Minimal YUV4MPEG2 stream: ASCII header + per-frame FRAME marker,
    * BT.601 luma plane from the pattern image, neutral chroma.
    */
  private def y4mClip(frames: Seq[java.awt.image.BufferedImage],
      cParam: String = "C420jpeg"): Array[Byte] = {
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $cParam\n".getBytes("US-ASCII"))
    val chromaBytes = cParam match {
      case c if c.startsWith("Cmono") => 0
      case c if c.startsWith("C422") => w * h
      case c if c.startsWith("C444") => 2 * w * h
      case _ => 2 * ((w + 1) / 2) * ((h + 1) / 2)
    }
    frames.foreach { img =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        out.write(math.min(255, math.round(lum).toInt))
      }
      (0 until chromaBytes).foreach(_ => out.write(128))
    }
    out.toByteArray
  }

  test("Y4M decodes as a real video container end-to-end") {
    import spark.implicits._
    val clip = y4mClip((0 until 5).map(i => patternImage(40, 30, seed = i)))
    val Some((w, h, fs)) = BinaryPipeline.demuxY4m(clip)
    assert(w == 40 && h == 30 && fs.length == 5)
    assert(BinaryPipeline.y4mFrameCount(clip).contains(5))
    // malformed / foreign payloads degrade, never throw
    assert(BinaryPipeline.demuxY4m("YUV4MPEG2 W0 H0\n".getBytes("US-ASCII")).isEmpty)
    assert(BinaryPipeline.demuxY4m(Array[Byte](1, 2, 3)).isEmpty)
    // truncation mid-frame keeps the intact prefix
    val cut = java.util.Arrays.copyOfRange(clip, 0, clip.length - 10)
    assert(BinaryPipeline.demuxY4m(cut).map(_._3.length).contains(4))
    val media = Seq(
      BinaryPipeline.MediaRecord(1L, "video", clip, "test", clip.length.toLong)).toDS()
    val f = BinaryPipeline.extractFeatures(media).collect().head
    assert(f.width == 40 && f.height == 30 && f.n_frames == 5,
      s"real Y4M decode expected, got $f")
  }

  test("Y4M chroma modes only change the frame stride, not the luma") {
    val frames = (0 until 3).map(i => patternImage(32, 24, seed = 7 + i))
    Seq("C420jpeg", "C422", "C444", "Cmono").foreach { c =>
      val d = BinaryPipeline.demuxY4m(y4mClip(frames, c))
      assert(d.map(_._3.length).contains(3), s"mode $c lost frames")
    }
  }

  test("Y4M and MJPEG encodings of the same clip are near-dups") {
    import spark.implicits._
    val frames = (0 until 8).map(i => patternImage(64, 48, seed = 300 + i))
    def rec(id: Long, bytes: Array[Byte]) =
      BinaryPipeline.MediaRecord(id, "video", bytes, "test", bytes.length.toLong)
    val media = Seq(
      rec(1L, mjpegAvi(frames)),
      rec(2L, y4mClip(frames)), // same scenes, uncompressed container
      rec(3L, y4mClip((0 until 8).map(i => patternImage(64, 48, seed = 700 + i))))
    ).toDS()
    assert(BinaryPipeline.videoHashes(media).count() == 3)
    val pairs = BinaryPipeline.nearDupVideo(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the cross-container pair, got $pairs")
  }

  test("video near-dup pairing finds the rescaled clip and not the stranger") {
    import spark.implicits._
    def clip(sz: Int, seedBase: Int): Array[Byte] =
      mjpegAvi((0 until 8).map(i => patternImage(sz, sz * 3 / 4, seed = seedBase + i)))
    def rec(id: Long, bytes: Array[Byte]) =
      BinaryPipeline.MediaRecord(id, "video", bytes, "test", bytes.length.toLong)
    val media = Seq(
      rec(1L, clip(64, seedBase = 1)),
      rec(2L, clip(128, seedBase = 1)), // same scenes, rescaled + re-encoded
      rec(3L, clip(64, seedBase = 40)), // unrelated clip
      rec(4L, Array[Byte](9, 9, 9)) // undecodable: dropped from hashing
    ).toDS()
    assert(BinaryPipeline.videoHashes(media).count() == 3, "junk must drop out")
    val pairs = BinaryPipeline.nearDupVideo(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the rescaled pair, got $pairs")
  }
}
