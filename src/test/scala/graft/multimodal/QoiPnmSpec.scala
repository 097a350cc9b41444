package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkSpec

/** The two hand-rolled pure-JVM image containers (QOI, binary PNM)
  * behind [[BinaryPipeline.decodeImageBuffered]]'s ImageIO fallback:
  * pixel-exact roundtrips against a reference raster encoded three ways
  * (PNG via ImageIO, QOI via a spec-faithful test encoder, P6/P5 by
  * hand), corrupt/truncated payloads degrade to None, and the
  * perceptual aHash64 agrees across containers (the property image
  * dedup actually relies on).
  */
class QoiPnmSpec extends SparkSpec {

  /** Deterministic 16×12 test raster with real structure (gradient +
    * block), exercising DIFF/LUMA/RUN/INDEX QOI paths.
    */
  private def raster(): BufferedImage = {
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) {
      val rgb =
        if (x >= 10 && y >= 6) 0xff8040 // constant block → RUN ops
        else ((x * 16) << 16) | ((y * 20) << 8) | ((x + y) * 4) // gradient
      img.setRGB(x, y, rgb)
    }
    img
  }

  /** Minimal spec-faithful QOI encoder (RGB literals + RUN + INDEX —
    * decode must handle every op; encode only needs a correct stream).
    */
  private def encodeQoi(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    u32(img.getWidth); u32(img.getHeight); out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = -1
    var run = 0
    def flushRun(): Unit = if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = img.getRGB(x, y) | 0xff000000
      if (v == pr && run < 62) run += 1
      else {
        flushRun()
        val r = (v >>> 16) & 0xff; val g = (v >>> 8) & 0xff; val b = v & 0xff
        val ip = (r * 3 + g * 5 + b * 7 + 255 * 11) & 0x3f
        if (index(ip) == v) out.write(ip) // QOI_OP_INDEX
        else {
          index(ip) = v
          out.write(0xfe); out.write(r); out.write(g); out.write(b)
        }
        pr = v
      }
    }
    flushRun()
    (0 until 7).foreach(_ => out.write(0)); out.write(1)
    out.toByteArray
  }

  private def encodePnm(img: BufferedImage, gray: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val hdr = s"P${if (gray) 5 else 6}\n# test comment\n${img.getWidth} ${img.getHeight}\n255\n"
    out.write(hdr.getBytes("US-ASCII"))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = img.getRGB(x, y)
      if (gray) out.write(((((v >>> 16) & 0xff) * 299 + ((v >>> 8) & 0xff) * 587
        + (v & 0xff) * 114) / 1000) & 0xff)
      else { out.write((v >>> 16) & 0xff); out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    }
    out.toByteArray
  }

  private def pixelsEqual(a: BufferedImage, b: BufferedImage): Boolean =
    a.getWidth == b.getWidth && a.getHeight == b.getHeight &&
      (0 until a.getHeight).forall(y => (0 until a.getWidth).forall(x =>
        (a.getRGB(x, y) & 0xffffff) == (b.getRGB(x, y) & 0xffffff)))

  test("QOI roundtrip is pixel-exact and flows through decodeImageBuffered") {
    val ref = raster()
    val qoi = encodeQoi(ref)
    val dec = BinaryPipeline.decodeQoi(qoi)
    assert(dec.isDefined && pixelsEqual(ref, dec.get))
    // the dispatch path (ImageIO first, QOI fallback) finds it too
    val via = BinaryPipeline.decodeImageBuffered(qoi)
    assert(via.isDefined && pixelsEqual(ref, via.get))
  }

  test("P6 roundtrip is pixel-exact; P5 decodes as gray; comments skipped") {
    val ref = raster()
    val p6 = BinaryPipeline.decodePnm(encodePnm(ref, gray = false))
    assert(p6.isDefined && pixelsEqual(ref, p6.get))
    val p5 = BinaryPipeline.decodePnm(encodePnm(ref, gray = true))
    assert(p5.isDefined && p5.get.getWidth == 16 && p5.get.getHeight == 12)
    val px = p5.get.getRGB(0, 5) // graymap decodes to r==g==b
    assert(((px >>> 16) & 0xff) == ((px >>> 8) & 0xff) &&
      ((px >>> 8) & 0xff) == (px & 0xff))
  }

  test("corrupt and truncated payloads degrade to None, never throw") {
    val ref = raster()
    val qoi = encodeQoi(ref)
    assert(BinaryPipeline.decodeQoi(qoi.take(qoi.length / 2)).isEmpty)
    assert(BinaryPipeline.decodeQoi("qoifgarbage".getBytes).isEmpty)
    assert(BinaryPipeline.decodeQoi(Array[Byte]()).isEmpty)
    val p6 = encodePnm(ref, gray = false)
    assert(BinaryPipeline.decodePnm(p6.take(p6.length - 10)).isEmpty)
    assert(BinaryPipeline.decodePnm("P6\n0 0\n255\n".getBytes).isEmpty)
    assert(BinaryPipeline.decodePnm("P7\n16 12\n255\n".getBytes).isEmpty)
    // 16-bit maxval is out of the 8-bit contract: refuse, don't misread
    assert(BinaryPipeline.decodePnm("P6\n2 2\n65535\n".getBytes ++
      Array.fill[Byte](24)(1)).isEmpty)
  }

  test("aHash64 agrees across PNG, QOI and P6 encodings of one raster") {
    val ref = raster()
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(ref, "png", bos)
      bos.toByteArray
    }
    val hashes = Seq(png, encodeQoi(ref), encodePnm(ref, gray = false))
      .map(p => BinaryPipeline.aHash64(BinaryPipeline.decodeImageBuffered(p).get))
    assert(hashes.distinct.size == 1,
      s"containers hashed differently: $hashes")
  }
}
