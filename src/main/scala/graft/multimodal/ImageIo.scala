package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image decode through [[Multimodal.Decoder]] — no stub: PNG/JPEG
  * bytes are genuinely decoded by the JDK-builtin `javax.imageio`
  * (reference analog: fegis embeds every stored document implicitly at
  * upsert, storage.py:194-199; an image corpus embeds through a decode →
  * feature step exactly like this one). The feature is the classic
  * perceptual-hash pipeline: decode → integer luma → area-mean downscale
  * to `dctSize`² → orthonormal 2-D DCT-II → top-left `k`×`k` coefficient
  * block (the image's low-frequency signature; pHash = sign-vs-median
  * bits over its AC terms, [[phashBits]]).
  *
  * Determinism contract (what lets a pinned-value oracle certify this):
  *  - PNG is lossless and BufferedImage.setRGB/getRGB round-trip int
  *    pixels exactly, so decoded pixels equal authored pixels bit-for-bit
  *    on any compliant JDK (encoder chunk layout may differ; pixel data
  *    cannot) — the gate therefore pins PIXEL-derived values only, never
  *    payload byte lengths or digests;
  *  - luma and downscale are integer sums with one exact int→double
  *    division per cell;
  *  - the DCT uses StrictMath.cos (bit-reproducible across JVMs, unlike
  *    platform-libm Math.cos) and a fixed summation order.
  *
  * Non-image payloads (audio/video kinds, corrupt bytes) fall back to the
  * deterministic [[Multimodal.DigestDecoder]] features for their rows —
  * the decoder never throws on undecodable input, mirroring how a 100 TB
  * media scan must quarantine, not abort, on codec failures.
  */
object ImageIo {

  /** Deterministic synthetic RGB image — pixel values are a pure function
    * of (id, x, y): smooth gradients plus id-keyed stripe offsets, so DCT
    * energy concentrates in low frequencies the way photographs do.
    * `perturb > 0` overwrites a small `perturb`×`perturb` corner block —
    * the "small edit" whose pHash must stay CLOSE to the unperturbed
    * image (the property a whole-payload digest feature cannot have).
    */
  def syntheticImage(id: Long, w: Int, h: Int, perturb: Int = 0): BufferedImage = {
    require(w >= 1 && h >= 1 && perturb >= 0)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val i = (id % 1000003L).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // gradients carry the low-frequency energy; the block
        // checkerboard adds MID-frequency texture so the DCT spectrum
        // is non-degenerate — without it most AC terms tie near the
        // median and pHash bits flip arbitrarily under tiny edits
        val t = 40 * ((x / 4 + y / 4 + i % 4) % 2)
        val r = (x * 255 / math.max(1, w - 1) + 13 * (i % 7) + t) % 256
        val g = (y * 255 / math.max(1, h - 1) + 29 * (i % 5) + t) % 256
        val b = ((x + y) * 255 / math.max(1, w + h - 2) + 53 * (i % 3) + t) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    var py = 0
    while (py < math.min(perturb, h)) {
      var px = 0
      while (px < math.min(perturb, w)) {
        img.setRGB(px, py, 0xffffff)
        px += 1
      }
      py += 1
    }
    img
  }

  /** Lossless PNG encode (ByteArrayOutputStream — no filesystem). */
  def pngBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Integer ITU-R BT.601 luma per pixel: (299r + 587g + 114b) / 1000 in
    * integer floor division — exact and engine-portable. */
  def grayscale(img: BufferedImage): Array[Array[Int]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(y)(x) = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** Area-mean downscale to n×n: target cell (i, j) averages the source
    * block rows [i·H/n, (i+1)·H/n) × cols [j·W/n, (j+1)·W/n) (floor
    * mapping — every source pixel lands in exactly one cell). Integer
    * sum, ONE exact int→double division per cell. */
  def downscale(g: Array[Array[Int]], n: Int): Array[Array[Double]] = {
    val h = g.length
    val w = g(0).length
    require(n >= 1 && h >= n && w >= n,
      s"downscale target $n exceeds image ${w}x$h")
    val out = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      val y0 = i * h / n; val y1 = (i + 1) * h / n
      var j = 0
      while (j < n) {
        val x0 = j * w / n; val x1 = (j + 1) * w / n
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += g(y)(x); x += 1 }
          y += 1
        }
        out(i)(j) = s.toDouble / ((y1 - y0).toLong * (x1 - x0))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Per-size DCT basis cache: the n×n StrictMath.cos table and the two
    * normalizers are pure functions of n, and [[dct2]] sits in the
    * per-image hot path of [[ImageIoDecoder.decodeBatch]] — rebuild once
    * per size, not once per decoded image. Values are deterministic, so
    * a concurrent recompute race is harmless. */
  private val dctBasisCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Array[Double]], Double, Double)]()

  private def dctBasis(n: Int): (Array[Array[Double]], Double, Double) =
    dctBasisCache.computeIfAbsent(n, { n =>
      (Array.tabulate(n, n) { (u, x) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n))
      }, StrictMath.sqrt(1.0 / n), StrictMath.sqrt(2.0 / n))
    })

  /** Orthonormal 2-D DCT-II (two separable 1-D passes, rows then
    * columns; fixed summation order; StrictMath.cos basis table). */
  def dct2(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    require(n >= 1 && a.forall(_.length == n), "dct2 needs a square input")
    val (basis, c0, c) = dctBasis(n)
    def pass(in: Array[Array[Double]]): Array[Array[Double]] =
      // transforms each ROW of `in`, emitting the result TRANSPOSED so
      // two identical passes yield the full row+column transform
      Array.tabulate(n, n) { (u, r) =>
        var s = 0.0
        var x = 0
        while (x < n) { s += in(r)(x) * basis(u)(x); x += 1 }
        (if (u == 0) c0 else c) * s
      }
    pass(pass(a))
  }

  /** 64-bit perceptual hash from a flattened k×k DCT block: the DC term
    * (index 0) is dropped, the remaining AC coefficients compare against
    * their LOWER MEDIAN (a real order statistic — no float averaging),
    * bit i set iff ac(i) > median. ≤ 63 bits — fits a signed long. */
  def phashBits(features: Seq[Double]): Long = {
    require(features.length >= 2 && features.length <= 64)
    val ac = features.drop(1).toArray
    val med = ac.sorted.apply((ac.length - 1) / 2)
    var bits = 0L
    var i = 0
    while (i < ac.length) {
      if (ac(i) > med) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Header-first bounded decode: read the image's DECLARED dimensions
    * from the codec header (no pixel allocation), refuse anything whose
    * pixel count exceeds `maxPixels`, then decode for real. This is the
    * decompression-bomb guard a 100 TB media scan needs — a forged
    * 100000×100000 PNG header would otherwise make `ImageIO.read`
    * attempt a tens-of-GB allocation, and an OutOfMemoryError is not a
    * per-row condition a `catch NonFatal` can quarantine: the task dies,
    * retries hit the same row, the job fails. Bounding BEFORE the
    * allocation keeps "quarantine, never abort" true without catching
    * fatal errors. Returns null for undecodable, headerless, or
    * oversized payloads.
    */
  def readBounded(bytes: Array[Byte], maxPixels: Long): BufferedImage =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (w < 1 || h < 1 || w * h > maxPixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch {
      case _: java.io.IOException => null
      case scala.util.control.NonFatal(_) => null
    }

  /** The real-decode [[Multimodal.Decoder]]: ImageIO decode → grayscale →
    * `dctSize`² area-mean downscale → DCT → top-left √dims×√dims block
    * flattened row-major as the feature vector. Rows whose bytes do not
    * decode as an image — or whose header declares more than `maxPixels`
    * (the decompression-bomb bound, see [[readBounded]]) — fall back to
    * [[Multimodal.DigestDecoder]].
    */
  final class ImageIoDecoder(dctSize: Int = 32,
      maxPixels: Long = 64L * 1024 * 1024) extends Multimodal.Decoder {
    require(dctSize >= 2 && dctSize <= 256 && maxPixels >= 1)

    override def decodeBatch(batch: Seq[Multimodal.MediaRow],
        dims: Int): Seq[Multimodal.DecodedRow] = {
      val k = math.sqrt(dims.toDouble).toInt
      require(k * k == dims && k <= dctSize,
        s"dims must be a square <= $dctSize^2, got $dims")
      batch.map { m =>
        val img = readBounded(m.bytes, maxPixels)
        if (img == null || img.getWidth < dctSize || img.getHeight < dctSize)
          Multimodal.DigestDecoder.decodeBatch(Seq(m), dims).head
        else {
          val d = dct2(downscale(grayscale(img), dctSize))
          val feats = for (u <- 0 until k; v <- 0 until k) yield d(u)(v)
          Multimodal.DecodedRow(m.mediaId, m.kind, m.bytes.length,
            graft.functions.HashFunctions.md5HexJvm(m.bytes), feats)
        }
      }
    }
  }
}
