package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  test("BM25 matches a hand-rolled reference on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "join the table"),
      (3L, "window scan")).toDF("doc_id", "text")

    val got = Bm25.score(docs, "text", "doc_id", "spark join")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent reference computation
    val n = 3.0
    val avgdl = 8.0 / 3.0
    def idf(df: Double) =
      BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(tf: Double, dl: Double, df: Double) =
      BigDecimal(idf(df) * ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = term(2, 3, 1) + term(1, 3, 2) // spark×2 + join×1
    val d2 = term(1, 3, 2)                 // join×1
    assert(got.keySet == Set(1L, 2L)) // d3 shares no term -> absent
    assert(math.abs(got(1L) - d1) < 1e-9, s"got ${got(1L)} want $d1")
    assert(math.abs(got(2L) - d2) < 1e-9)
    // more occurrences of a rarer term must outrank the common term
    assert(got(1L) > got(2L))
  }

  test("BM25 favors rare terms and saturates with tf") {
    import spark.implicits._
    val docs = (1 to 20).map(i =>
      (i.toLong, if (i == 1) "rare common" else "common filler")).toDF("doc_id", "text")
    val got = Bm25.score(docs, "text", "doc_id", "rare common")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the one doc containing the rare term dominates every common-only doc
    assert(got(1L) > got.removed(1L).values.max * 2)
  }
}
