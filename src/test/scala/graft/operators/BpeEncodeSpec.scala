package graft.operators

import graft.SparkSpec

/** BPE encode (apply a trained merge table): constructed corpora where the
  * merge chain is hand-derivable, plus character-mass conservation. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("trained merges apply in order with feed-forward") {
    val docs = Seq((1L, "abab ab")).toDF("doc_id", "text")
    val table = TextAnalysis.bpeTrain(docs, "text", merges = 2)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1 merges (a,b); the greedy left-to-right rewrite of
    // " a b a b " consumes the shared space, so one " a b " survives into
    // round 2 and (a,b) wins again — the second pass then merges it
    assert(table === Seq(("a", "b"), ("a", "b")))
    val enc = TextAnalysis.bpeEncode(docs, "text", table)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(enc.toSeq === Seq(("ab", 3L)))
  }

  test("empty merge table yields raw character counts") {
    val docs = Seq((1L, "aab b")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, "text", Seq.empty)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(enc === Map("a" -> 2L, "b" -> 2L))
  }

  test("merging conserves character mass") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the rat ate the oat"),
      (3L, "that hat that bat")).toDF("doc_id", "text")
    val totalChars = docs.collect()
      .map(_.getString(1).count(_ != ' ').toLong).sum
    val table = TextAnalysis.bpeTrain(docs, "text", merges = 4)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(table.nonEmpty)
    val enc = TextAnalysis.bpeEncode(docs, "text", table, topK = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(enc.map { case (sym, n) => sym.length * n }.sum === totalChars)
    // at least one multi-character symbol exists after 4 merges
    assert(enc.exists(_._1.length > 1))
  }
}
