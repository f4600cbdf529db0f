package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Container-demux coverage for the AVI path: frames that go into the
  * authored RIFF/AVI come back byte-identical in stream order, odd-size
  * payloads honor the RIFF even-padding rule, `rec ` interleave groups
  * are descended, foreign/corrupt bytes quarantine as empty, and the
  * demuxed frames remain genuinely decodable pixels through the
  * ImageIoDecoder (the full container-in → pixel-out pipeline). */
class VideoIoSpec extends AnyFunSuite {

  private def pngFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(i =>
      ImageIo.pngBytes(ImageIo.syntheticImage(i.toLong, w = 40, h = 32)))

  test("AVI mux/demux roundtrip is byte-exact per frame, in order") {
    val frames = pngFrames(5)
    val avi = VideoIo.aviBytes(frames, w = 40, h = 32)
    val back = VideoIo.demuxFrames(avi)
    assert(back.size == 5)
    frames.zip(back).foreach { case (a, b) =>
      assert(a.sameElements(b), "frame bytes changed through AVI roundtrip")
    }
  }

  test("odd-size frame payloads honor RIFF even padding") {
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8))
    val avi = VideoIo.aviBytes(odd, w = 1, h = 1)
    val back = VideoIo.demuxFrames(avi)
    assert(back.map(_.toSeq) == odd.map(_.toSeq))
  }

  test("rec interleave groups inside movi are descended") {
    // hand-splice: wrap the movi chunks of a 2-frame AVI in a 'rec ' LIST
    val frames = Seq(Array[Byte](9, 9), Array[Byte](8, 8))
    val avi = VideoIo.aviBytes(frames, w = 1, h = 1)
    // locate the movi LIST and rebuild its body as LIST('rec ', chunks)
    val bb = java.nio.ByteBuffer.wrap(avi).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String) = (s(0) & 0xff) | ((s(1) & 0xff) << 8) |
      ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
    var pos = 12
    var moviPos = -1
    while (moviPos < 0 && pos + 8 <= avi.length) {
      val id = bb.getInt(pos); val size = bb.getInt(pos + 4)
      if (id == fcc("LIST") && bb.getInt(pos + 8) == fcc("movi")) moviPos = pos
      else pos += 8 + size + (size & 1)
    }
    assert(moviPos > 0)
    val moviSize = bb.getInt(moviPos + 4)
    val chunks = avi.slice(moviPos + 12, moviPos + 8 + moviSize)
    val out = java.nio.ByteBuffer
      .allocate(moviPos + 8 + 4 + 8 + 4 + chunks.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(avi, 0, moviPos)
    out.putInt(fcc("LIST")).putInt(4 + 8 + 4 + chunks.length).putInt(fcc("movi"))
    out.putInt(fcc("LIST")).putInt(4 + chunks.length).putInt(fcc("rec "))
    out.put(chunks)
    val spliced = out.array()
    // fix the RIFF size field to the new total
    val fixed = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fixed.putInt(4, spliced.length - 8)
    val back = VideoIo.demuxFrames(spliced)
    assert(back.map(_.toSeq) == frames.map(_.toSeq))
  }

  test("foreign and corrupt payloads quarantine as empty") {
    assert(VideoIo.demuxFrames(null) == Nil)
    assert(VideoIo.demuxFrames(Array[Byte](1, 2, 3)) == Nil)
    assert(VideoIo.demuxFrames("not a riff at all, just text".getBytes) == Nil)
    // a valid WAV is RIFF but not AVI — must not parse as video
    val wav = AudioIo.wavBytes(AudioIo.syntheticPcm(1L, samples = 256))
    assert(VideoIo.demuxFrames(wav) == Nil)
    // truncated AVI: keep the frames that fit, never throw
    val avi = VideoIo.aviBytes(pngFrames(3), w = 40, h = 32)
    val truncated = avi.take(avi.length / 2)
    VideoIo.demuxFrames(truncated) // must not throw
  }

  test("demuxed frames decode to real pixels through ImageIO") {
    val frames = pngFrames(2)
    val back = VideoIo.demuxFrames(VideoIo.aviBytes(frames, w = 40, h = 32))
    back.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 40 && img.getHeight == 32)
    }
  }
}
