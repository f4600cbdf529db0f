package graft.operators

import graft.SparkSpec

/** Nucleus truncation on a hand-built bigram distribution. */
class LmNucleusSpec extends SparkSpec {
  import spark.implicits._

  test("minimal prefix reaching p=4/5, all-integer boundary") {
    // context "x" followed by: a×6, b×2, c×1, d×1 (total 10).
    // cum_prev: a=0, b=6, c=8, d=9; keep while 5*cum_prev < 4*10=40 →
    // a (0), b (30), c (40 → NOT < 40, dropped). Nucleus = {a, b}.
    val text = ("x a " * 6) + ("x b " * 2) + "x c x d"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.lmNucleus(docs, "text", pNum = 4, pDen = 5,
      minTotal = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val xRows = got.filter(_._1 == "x")
    assert(xRows.toSeq === Seq(("x", 1L, "a", 6L), ("x", 2L, "b", 2L)))
    // contexts below minTotal never appear ("a" precedes "x" 5 times? no:
    // every non-x context has total < 5 here)
    assert(got.forall(r => r._1 == "x" || r._1 == "a"))
  }

  test("exact-boundary mass is excluded (minimality)") {
    // a: p×4, q×1 (total 5). p=4/5: cum_prev(q)=4 → 5*4=20 < 4*5=20 is
    // FALSE → q excluded; nucleus is exactly {p} which already has 4/5.
    val text = ("a p " * 4) + "a q"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.lmNucleus(docs, "text", pNum = 4, pDen = 5,
      minTotal = 5)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(got.filter(_._1 == "a").map(_._2).toSeq === Seq("p"))
  }
}
