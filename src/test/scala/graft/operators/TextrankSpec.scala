package graft.operators

import graft.SparkSpec

class TextrankSpec extends SparkSpec {

  test("textrank: regular graph is a fixed point at score 1.0") {
    import spark.implicits._
    // single edge a—b: both nodes have one neighbor with full weight →
    // every iteration returns 0.25 + 0.75·1.0 = 1.0 exactly
    val df = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.textrank(df, "text", window = 1,
      iters = 3, damping = 0.75, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.0, "b" -> 1.0))
  }

  test("textrank: hub word outranks leaves") {
    import spark.implicits._
    val df = Seq((1L, "h a h b h c h d")).toDF("doc_id", "text")
    val rows = TextAnalysis.textrank(df, "text", window = 1,
      iters = 3, damping = 0.75, topK = 10).collect()
    assert(rows.head.getString(0) == "h", rows.mkString(","))
    val scores = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(l => scores("h") > scores(l)))
  }

  test("textrank: deterministic under repartitioning") {
    import spark.implicits._
    val df = (1L to 20L).map(i =>
      (i, s"w${i % 5} w${i % 3} w${i % 7} w${i % 5}")).toDF("doc_id", "text")
    val a = TextAnalysis.textrank(df, "text", window = 2, iters = 3,
      damping = 0.75, topK = 20).collect().map(r => (r.getString(0), r.getDouble(1)))
    val b = TextAnalysis.textrank(df.repartition(7), "text", window = 2,
      iters = 3, damping = 0.75, topK = 20).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }
}
