package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).head()

  test("normalizeWhitespace collapses runs and trims") {
    assert(one(TextFunctions.normalizeWhitespace(lit("  a \t b\n\nc "))).getString(0) == "a b c")
  }

  // Literal Scala port of the reference's format_content_preview +
  // extract_summary (formatters.py:172-218) — the oracle for the Column
  // implementation.
  private def pySummary(content: String, maxSentences: Int): String = {
    if (content.isEmpty) return ""
    val sentences = content.split("[.!?]+").map(_.trim).filter(_.nonEmpty)
    if (sentences.isEmpty) {
      if (content.length <= 100) content else content.substring(0, 97) + "..."
    } else {
      var summary = sentences.take(maxSentences).mkString(". ")
      if (summary.nonEmpty && !".!?".contains(summary.last)) summary += "."
      summary
    }
  }
  private def pyPreview(content: String, maxLength: Int = 150): String = {
    if (content.isEmpty) return ""
    val cleaned = content.split("\\s+").filter(_.nonEmpty).mkString(" ")
    if (cleaned.length <= maxLength) return cleaned
    val preview = pySummary(cleaned, 2)
    if (preview.length <= maxLength) preview
    else preview.substring(0, maxLength - 3) + "..."
  }

  test("contentPreview matches the ported reference semantics") {
    val long1 = "A".repeat(90) + " tail!"
    val long2 = "B".repeat(90) + "?"
    val cases = Seq(
      "Short one.",
      "",
      "  spaced   out\t\ttext  ",
      // 2-sentence cap: third sentence never appears
      s"$long1 $long2 Third sentence here.",
      // terminator rewrite: "!"/"?" become ". " joins + trailing "."
      "Wow! " + "Really?".repeat(30),
      // unterminated trailing fragment counts as a sentence
      "x".repeat(200),
      "first bit. " + "y".repeat(180),
      // no fragments at all -> extract_summary raw fallback
      ". ! ? ".repeat(40),
      "z. ".repeat(120),
      "Sentence one is here. Sentence two is here. Sentence three is long " +
        "enough that everything together far exceeds the length cap of one " +
        "hundred and fifty characters in total.")
    for (c <- cases) {
      val got = one(TextFunctions.contentPreview(lit(c), 150)).getString(0)
      assert(got == pyPreview(c), s"for input: '$c'")
    }
    // staged DataFrame form agrees with the single-Column form
    import spark.implicits._
    val df = cases.toDF("text")
    val staged = TextFunctions.withContentPreview(df, "text", "p")
      .select("p").as[String].collect()
    assert(staged.toSeq == cases.map(pyPreview(_)))
  }

  test("contentPreview caps the no-sentence fallback at small maxLen too") {
    val c = ". ".repeat(40) // 79 normalized chars, zero sentence fragments
    assert(one(TextFunctions.contentPreview(lit(c), 50)).getString(0)
      == pyPreview(c, 50)) // fallback text must still be cut to 47 + "..."
    assert(pyPreview(c, 50).length == 50)
  }

  test("contentPreview fuzz: random sentence soups match the port") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "delta", "ep", "zeta-long-word",
      "x", "..", "!?", "X".repeat(60))
    val terms = Seq(".", "!", "?", "...", "?!", " ", "")
    val cases = (1 to 200).map { _ =>
      val n = rnd.nextInt(25)
      (0 until n).map { _ =>
        words(rnd.nextInt(words.length)) + terms(rnd.nextInt(terms.length)) +
          (if (rnd.nextBoolean()) " " else "  ")
      }.mkString
    }
    val got = TextFunctions.withContentPreview(cases.toDF("text"), "text", "p")
      .select("p").as[String].collect().toSeq
    val want = cases.map(pyPreview(_))
    got.zip(want).zip(cases).foreach { case ((g, w), in) =>
      assert(g == w, s"for input <$in>: got <$g> want <$w>")
    }
  }

  // Literal port of format_relative_time (formatters.py:141-169) with
  // Python timedelta normalization: days = floorDiv, remainder >= 0.
  private def pyRelTime(secs: Long): String = {
    val days = Math.floorDiv(secs, 86400L)
    val rem = Math.floorMod(secs, 86400L)
    if (days > 0) {
      if (days == 1) "1 day ago"
      else if (days < 7) s"$days days ago"
      else if (days < 30) { val w = days / 7; s"$w week${if (w > 1) "s" else ""} ago" }
      else { val m = days / 30; s"$m month${if (m > 1) "s" else ""} ago" }
    } else {
      val hours = rem / 3600
      val minutes = (rem % 3600) / 60
      if (hours > 0) s"$hours hour${if (hours > 1) "s" else ""} ago"
      else if (minutes > 0) s"$minutes minute${if (minutes > 1) "s" else ""} ago"
      else "just now"
    }
  }

  test("relativeTime buckets match the ported reference incl. future ts") {
    val nowTs = Timestamp.valueOf("2024-01-31 00:00:00")
    val now = lit(nowTs)
    def rel(ts: String) =
      one(TextFunctions.relativeTime(lit(Timestamp.valueOf(ts)), now)).getString(0)
    def want(ts: String) =
      pyRelTime((nowTs.getTime - Timestamp.valueOf(ts).getTime) / 1000)
    val cases = Seq(
      "2024-01-30 23:59:30", "2024-01-30 23:59:00", "2024-01-30 23:30:00",
      "2024-01-30 23:00:00", "2024-01-30 12:00:00", "2024-01-30 00:00:00",
      "2024-01-28 00:00:00", "2024-01-20 00:00:00", "2023-12-25 00:00:00",
      "2023-11-01 00:00:00",
      // FUTURE timestamps: timedelta normalization reports the positive
      // remainder, never "just now" (formatters.py via Python timedelta)
      "2024-01-31 00:00:30", "2024-01-31 02:15:00", "2024-02-06 12:00:00")
    cases.foreach(ts => assert(rel(ts) == want(ts), s"for ts $ts"))
    // spot-check the exact reference strings
    assert(rel("2024-01-30 23:30:00") == "30 minutes ago")
    assert(rel("2024-01-20 00:00:00") == "1 week ago")
    assert(rel("2024-01-31 00:00:30") == "23 hours ago") // future, 30s ahead
  }

  // Literal port of textwrap.shorten(width, placeholder='…') — validated
  // against CPython textwrap on the same cases before porting.
  private def pyShorten(text: String, width: Int, ph: String = "…"): String = {
    val norm = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
    if (norm.length <= width) norm
    else {
      val toks = norm.split(" ").toSeq
      val budget = width - ph.length
      val keep = (1 to toks.length)
        .filter(i => toks.take(i).mkString(" ").length <= budget)
        .lastOption.getOrElse(0)
      if (keep > 0) toks.take(keep).mkString(" ") + ph else ph
    }
  }

  test("withShortened matches textwrap.shorten semantics") {
    import spark.implicits._
    val cases = Seq(
      "aaa bbbbbbbbbb cc", // long word stops the prefix; cc must NOT glue on
      "the quick brown fox jumps over the lazy dog",
      "superlongwordthatneverfits",
      "short", "a  b   c", "word ".repeat(40), "x".repeat(79) + " yy")
    for (width <- Seq(10, 20, 80)) {
      val got = graft.functions.TextFunctions
        .withShortened(cases.toDF("text"), "text", "s", width)
        .select("s").as[String].collect().toSeq
      assert(got == cases.map(pyShorten(_, width)), s"width=$width")
    }
  }

  test("tokens and wordShingles") {
    assert(one(TextFunctions.tokens(lit(" a  b c "))).getSeq[String](0) == Seq("a", "b", "c"))
    assert(one(TextFunctions.wordShingles(lit("a b c d"), 3)).getSeq[String](0)
      == Seq("a b c", "b c d"))
    assert(one(TextFunctions.wordShingles(lit("a b"), 3)).getSeq[String](0).isEmpty)
  }

  test("bpe-ish token count: words, numbers, punctuation each count") {
    assert(one(TextFunctions.tokenCountBpeIsh(lit("hello, world 42!"))).getInt(0) == 5)
  }

  test("vector math: dot, norm, cosine") {
    val a = typedLit(Seq(1.0f, 2.0f, 2.0f))
    val b = typedLit(Seq(2.0f, 0.0f, 0.0f))
    assert(one(VectorFunctions.dot(a, b)).getDouble(0) == 2.0)
    assert(one(VectorFunctions.l2Norm(a)).getDouble(0) == 3.0)
    assert(math.abs(one(VectorFunctions.cosine(a, b)).getDouble(0) - 1.0 / 3.0) < 1e-12)
    // zero vector -> null, not NaN
    assert(one(VectorFunctions.cosine(a, typedLit(Seq(0.0f, 0.0f, 0.0f)))).isNullAt(0))
  }

  test("hyperplaneSigns are deterministic ±1; rhpBucket within range") {
    val s1 = VectorFunctions.hyperplaneSigns(4, 8, 42)
    assert(s1 == VectorFunctions.hyperplaneSigns(4, 8, 42))
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    val b = one(VectorFunctions.rhpBucket(
      typedLit(Seq.fill(8)(0.5f)), 4, 42, 8)).getLong(0)
    assert(b >= 0 && b < 16)
  }

  test("embedder: unit vectors, deterministic, text-sensitive") {
    val e1 = one(Embedder.embed(lit("hello"), 16)).getSeq[Double](0)
    val e2 = one(Embedder.embed(lit("hello"), 16)).getSeq[Double](0)
    val e3 = one(Embedder.embed(lit("world"), 16)).getSeq[Double](0)
    assert(e1 == e2 && e1 != e3)
    assert(math.abs(math.sqrt(e1.map(x => x * x).sum) - 1.0) < 1e-9)
  }

  test("hash64 column matches JVM twin") {
    val fromCol = spark.range(1)
      .select(HashFunctions.hash64(lit("graft"))).head().getLong(0)
    assert(fromCol == HashFunctions.hash64Jvm("graft"))
  }
}
