package graft.operators

import graft.SparkSpec

/** Mixed-language flagging on constructed bilingual docs, and the exact
  * radius-1 simhash pairing against a brute-force Hamming census. */
class MixedLangRadiusSpec extends SparkSpec {
  import spark.implicits._

  test("mixedLanguage flags the bilingual doc, not the monolingual ones") {
    val en = "the of and to is that it for the a" // 10 en stopwords → 2 chunks of 8? no: 10 tokens → chunks of 8 → [8 en][2 en]
    val bilingual = "the of and to is that it for " + // chunk 1: en
      "el la de que y un los se"                     // chunk 2: es
    val docs = Seq(
      (1L, bilingual),
      (2L, en),
      (3L, "mystery words nobody recognizes here at") // und only → 1 lang
    ).toDF("doc_id", "text")
    val got = TextAnalysis.mixedLanguage(docs, "text", "doc_id", chunkTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    assert(got.keySet === Set(1L))
    // two chunks, two languages; majority tie (1 en, 1 es) breaks to 'en'
    assert(got(1L) === ((2L, 2L, "en", 1L)))
  }

  test("simhashRadiusPairs equals the brute-force Hamming<=1 census") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical → hamming 0
      (3L, "alpha beta gamma epsilon"),
      (4L, "totally different words here entirely"),
      (5L, "alpha beta gamma delta zeta")
    ).toDF("doc_id", "text")
    val codes = Dedup.simhash(docs, "text", "doc_id", bits = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- codes.keys; b <- codes.keys if a < b
      h = java.lang.Long.bitCount(codes(a) ^ codes(b))
      if h <= 1
    } yield (a, b, h)).toSet
    val got = Dedup.simhashRadiusPairs(docs, "text", "doc_id", bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
    assert(got.exists(_._3 == 0)) // the identical pair is in there
  }
}
