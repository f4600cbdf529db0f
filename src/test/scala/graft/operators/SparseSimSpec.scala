package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimSpec extends SparkSpec {

  test("cosinePairs: exact bag-of-words cosine, a < b, threshold applied") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a b"),   // tf {a:2, b:1}, norm sqrt(5)
      (2L, "a b b"),   // tf {a:1, b:2}, norm sqrt(5)
      (3L, "c c c c")) // shares no term with 1/2
      .toDF("doc_id", "text")
    val got = SparseSim.cosinePairs(df, "text", "doc_id", minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dot(1,2) = 2*1 + 1*2 = 4; cos = 4/5
    assert(got == Map((1L, 2L) -> 0.8))
    val none = SparseSim.cosinePairs(df, "text", "doc_id", minSim = 0.9)
    assert(none.count() == 0)
  }

  test("cosinePairs: df cap drops stop-terms and recomputes norms over survivors") {
    import spark.implicits._
    // "x" appears in all 3 docs (df=3); cap 2 removes it entirely
    val df = Seq((1L, "x p"), (2L, "x p"), (3L, "x q"))
      .toDF("doc_id", "text")
    val capped = SparseSim.cosinePairs(df, "text", "doc_id",
      minSim = 0.0, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // surviving vectors: 1={p}, 2={p}, 3={q} → only (1,2) at cosine 1.0
    assert(capped == Map((1L, 2L) -> 1.0))
    val uncapped = SparseSim.cosinePairs(df, "text", "doc_id", minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // with "x" kept every pair shares it: 3 pairs, (1,2) = 1.0, others 0.5
    assert(uncapped == Map((1L, 2L) -> 1.0, (1L, 3L) -> 0.5, (2L, 3L) -> 0.5))
  }

  test("cosinePairs: termK=2 scores in shingle space with multiplicity") {
    import spark.implicits._
    // bigrams of 1: {"a b", "b a", "a b"} (multiplicity 2 on "a b");
    // bigrams of 2: {"a b"}; dot = 2, norms sqrt(5), 1
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = SparseSim.cosinePairs(df, "text", "doc_id",
      minSim = 0.0, termK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, 2L) -> BigDecimal(2.0 / math.sqrt(5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("cosinePairsManaged: release handle drops the postings cache entry, result unchanged") {
    import spark.implicits._
    val df = Seq((1L, "x p"), (2L, "x p q"), (3L, "r s")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (pairs, release) = SparseSim.cosinePairsManaged(df, "text", "doc_id", minSim = 0.0)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "postings should be cached while the result is consumed")
    release()
    // non-blocking unpersist: poll briefly for the entry to drop
    val deadline = System.nanoTime() + 5e9.toLong
    while (spark.sparkContext.getPersistentRDDs.size > before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() must drop the postings cache entry")
  }

  test("cosinePairsAuto: cap derived from corpus size") {
    import spark.implicits._
    val df = Seq((1L, "x p"), (2L, "x p"), (3L, "x q")).toDF("doc_id", "text")
    // n=3, frac 0.5 → cap = max(2, ceil(1.5)) = 2 → same as explicit cap 2
    val got = SparseSim.cosinePairsAuto(df, "text", "doc_id",
      minSim = 0.0, maxDfFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((1L, 2L) -> 1.0))
  }
}
