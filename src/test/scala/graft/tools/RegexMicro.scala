package graft.tools

object RegexMicro {
  def main(a: Array[String]): Unit = {
    val text = ("lorem ipsum dolor sit amet " * 15) + ". " +
      ("more words here " * 10) + "! tail fragment"
    for (p <- Seq("[^.!?]+[.!?]+", "[^.!?]++[.!?]++")) {
      val pat = java.util.regex.Pattern.compile(p)
      val t0 = System.nanoTime(); var n = 0
      for (_ <- 1 to 5000) { val m = pat.matcher(text); while (m.find()) n += 1 }
      println(f"$p: ${(System.nanoTime() - t0) / 1e6}%.1f ms for 5000 iters, $n matches")
    }
  }
}
