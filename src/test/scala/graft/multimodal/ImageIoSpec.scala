package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-decode coverage: the pixels that come OUT of javax.imageio are
  * the pixels that went in (PNG lossless roundtrip), the DCT is the
  * orthonormal transform it claims to be (Parseval), the decoder's
  * features equal the hand-computed pipeline, undecodable payloads fall
  * back to the digest stub, and the pHash has the perceptual property
  * the whole-payload digest cannot: small edits → near hashes. */
class ImageIoSpec extends SparkSpec {

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("PNG encode/decode roundtrip is pixel-exact") {
    val img = ImageIo.syntheticImage(3L, w = 50, h = 40)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageIo.pngBytes(img)))
    assert(back.getWidth == 50 && back.getHeight == 40)
    for (y <- 0 until 40; x <- 0 until 50)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y) changed through PNG roundtrip")
  }

  test("downscale: exact integer block means, floor-mapped cover") {
    // 4x4 -> 2x2: each target cell is the mean of one 2x2 block
    val g = Array(
      Array(0, 2, 10, 10),
      Array(2, 4, 10, 10),
      Array(100, 100, 7, 9),
      Array(100, 100, 11, 13))
    val d = ImageIo.downscale(g, 2)
    assert(d(0)(0) == 2.0 && d(0)(1) == 10.0)
    assert(d(1)(0) == 100.0 && d(1)(1) == 10.0)
    // non-divisible 5x5 -> 2x2: blocks are [0,2)x[0,2) and [2,5)x[2,5)
    val g5 = Array.tabulate(5, 5)((y, x) => y * 5 + x)
    val d5 = ImageIo.downscale(g5, 2)
    assert(d5(0)(0) == (0 + 1 + 5 + 6) / 4.0)
    assert(d5(1)(1) == (12 + 13 + 14 + 17 + 18 + 19 + 22 + 23 + 24) / 9.0)
  }

  test("dct2 is orthonormal: constant-image DC, Parseval energy") {
    val n = 8
    val const = Array.fill(n, n)(5.0)
    val dc = ImageIo.dct2(const)
    assert(math.abs(dc(0)(0) - n * 5.0) < 1e-9)
    for (u <- 0 until n; v <- 0 until n; if u + v > 0)
      assert(math.abs(dc(u)(v)) < 1e-9, s"AC($u,$v) of a constant image")
    val rnd = Array.tabulate(n, n)((y, x) =>
      ((y * 31 + x * 17) % 13).toDouble)
    val f = ImageIo.dct2(rnd)
    val inE = rnd.flatten.map(x => x * x).sum
    val outE = f.flatten.map(x => x * x).sum
    assert(math.abs(inE - outE) < 1e-6, "Parseval: energy must be preserved")
  }

  test("decoder features equal the hand-computed pipeline; fallback for non-images") {
    val img = ImageIo.syntheticImage(1L, w = 48, h = 36)
    val png = ImageIo.pngBytes(img)
    val dec = new ImageIo.ImageIoDecoder(dctSize = 32)
    val rows = dec.decodeBatch(Seq(
      Multimodal.MediaRow(7L, "image", png),
      Multimodal.MediaRow(8L, "audio", Array[Byte](1, 2, 3, 4, 5))), dims = 64)
    val expected = ImageIo.dct2(ImageIo.downscale(ImageIo.grayscale(img), 32))
    val feats = rows.head.features
    for (u <- 0 until 8; v <- 0 until 8)
      assert(feats(u * 8 + v) == expected(u)(v),
        s"feature ($u,$v) diverges from the hand-computed DCT")
    // undecodable bytes: digest-stub features, not an exception
    val fb = Multimodal.DigestDecoder.decodeBatch(
      Seq(Multimodal.MediaRow(8L, "audio", Array[Byte](1, 2, 3, 4, 5))), 64).head
    assert(rows(1).features == fb.features && rows(1).digest == fb.digest)
  }

  test("pHash: identical -> 0, small edit -> near, different image -> far") {
    def hashOf(id: Long, perturb: Int) = {
      val png = ImageIo.pngBytes(
        ImageIo.syntheticImage(id, w = 64, h = 48, perturb = perturb))
      val dec = new ImageIo.ImageIoDecoder()
      ImageIo.phashBits(
        dec.decodeBatch(Seq(Multimodal.MediaRow(id, "image", png)), 64)
          .head.features)
    }
    val base = hashOf(2L, 0)
    assert(hamming(base, hashOf(2L, 0)) == 0)
    val nearD = hamming(base, hashOf(2L, 3))
    val farD = hamming(base, hashOf(4L, 0))
    assert(nearD <= 8, s"3x3-corner edit moved $nearD pHash bits")
    assert(farD >= 16, s"different image only $farD pHash bits apart")
    assert(nearD < farD)
  }

  test("JPEG payloads decode through the same seam (lossy: near, not pinned)") {
    // JPEG decode output is NOT bit-pinned across JVMs (IDCT variants),
    // which is why the oracle gates stay on PNG — but the decoder must
    // accept JPEG bytes and produce features from the real pixels:
    // the DC term (mean luma × dctSize) of the lossy roundtrip must sit
    // within a few percent of the lossless one, and the pHash within a
    // small Hamming radius — both impossible for the digest fallback.
    val img = ImageIo.syntheticImage(2L, w = 64, h = 48)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos),
      "JDK JPEG writer unavailable")
    val dec = new ImageIo.ImageIoDecoder()
    val rows = dec.decodeBatch(Seq(
      Multimodal.MediaRow(1L, "image", ImageIo.pngBytes(img)),
      Multimodal.MediaRow(2L, "image", bos.toByteArray)), dims = 64)
    val (png, jpg) = (rows(0).features, rows(1).features)
    assert(math.abs(png.head - jpg.head) / math.abs(png.head) < 0.05,
      s"JPEG DC ${jpg.head} strays >5% from lossless ${png.head}")
    val ham = hamming(ImageIo.phashBits(png), ImageIo.phashBits(jpg))
    assert(ham <= 10, s"JPEG roundtrip moved $ham pHash bits")
    // and it is NOT the digest fallback output
    val fb = Multimodal.DigestDecoder.decodeBatch(
      Seq(Multimodal.MediaRow(2L, "image", bos.toByteArray)), 64).head
    assert(jpg != fb.features)
  }

  test("readBounded: decompression-bomb header quarantines before any pixel allocation") {
    // hand-author a PNG whose IHDR declares 100000x100000 (40 GB of
    // pixels) with a correct chunk CRC — the header parses, the decode
    // must be refused by the bound, not attempted
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = java.nio.ByteBuffer.allocate(4 + 4 + 13 + 4)
    ihdr.putInt(13)
    val body = java.nio.ByteBuffer.allocate(4 + 13)
    body.put("IHDR".getBytes("US-ASCII"))
      .putInt(100000).putInt(100000)           // width, height
      .put(8.toByte).put(2.toByte)             // bit depth, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update(body.array())
    ihdr.put(body.array()).putInt(crc.getValue.toInt)
    bos.write(ihdr.array())
    val bomb = bos.toByteArray
    assert(ImageIo.readBounded(bomb, maxPixels = 64L * 1024 * 1024) == null)
    // the same guard passes a real image through bit-identically
    val png = ImageIo.pngBytes(ImageIo.syntheticImage(5L, w = 40, h = 40))
    val img = ImageIo.readBounded(png, maxPixels = 64L * 1024 * 1024)
    assert(img != null && img.getWidth == 40)
    assert(ImageIo.grayscale(img).flatten.toSeq ==
      ImageIo.grayscale(ImageIo.syntheticImage(5L, w = 40, h = 40)).flatten.toSeq)
    // and a legitimate image larger than the bound quarantines too
    assert(ImageIo.readBounded(png, maxPixels = 100L) == null)
    // the decoder routes the bomb to the digest fallback, not a crash
    val out = new ImageIo.ImageIoDecoder().decodeBatch(
      Seq(Multimodal.MediaRow(9L, "image", bomb)), 64).head
    assert(out.features == Multimodal.DigestDecoder.decodeBatch(
      Seq(Multimodal.MediaRow(9L, "image", bomb)), 64).head.features)
  }

  test("extractFeatures plumbing carries the real decoder end-to-end") {
    import spark.implicits._
    val media = spark.range(0, 4).as[Long].map { id =>
      (id, "image",
        ImageIo.pngBytes(ImageIo.syntheticImage(id, w = 40, h = 40)))
    }.toDF("media_id", "kind", "bytes")
    val f = Multimodal.extractFeatures(media, dims = 64, batchSize = 3,
      decoder = new ImageIo.ImageIoDecoder())
    assert(f.count() == 4)
    val r = f.where(col("media_id") === 1).head()
    val expected = ImageIo.dct2(ImageIo.downscale(ImageIo.grayscale(
      ImageIo.syntheticImage(1L, w = 40, h = 40)), 32))
    assert(r.getAs[Seq[Double]]("features").head == expected(0)(0))
  }
}
