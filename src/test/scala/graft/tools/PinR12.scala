package graft.tools

import graft.multimodal.{ImageIo, Multimodal, VideoIo}

/** Round-12 pin generator: computes the per-frame DCT features of the
  * demuxed video clips locally (no Spark) so the
  * `multimodal_video_demux_frames` oracle can pin them as shared
  * constants — the engine recomputes the same values through the
  * distributed demux → decode pipeline on every run.
  */
object PinR12 {
  def main(args: Array[String]): Unit = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dec = new ImageIo.ImageIoDecoder()
    for (clip <- 0L until 4L) {
      val frames = (0 until 5).map { frame =>
        val imgId = if (clip == 3) frame + 1 else clip * 16 + frame
        ImageIo.pngBytes(ImageIo.syntheticImage(imgId.toLong, w = 48, h = 36))
      }
      val avi = VideoIo.aviBytes(frames, w = 48, h = 36)
      val back = VideoIo.demuxFrames(avi)
      back.zipWithIndex.foreach { case (f, i) =>
        val d = dec.decodeBatch(
          Seq(Multimodal.MediaRow(clip * 5 + i, "image", f)), dims = 64).head
        println(s"PIN ($clip, $i, ${r6(d.features.head)}, " +
          s"${r6(d.features(1))}, ${r6(d.features(8))}),")
      }
    }
  }
}
