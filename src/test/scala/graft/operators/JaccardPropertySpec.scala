package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: the distributed shingle-join Jaccard agrees with a naive
  * in-memory computation over the same (hashed, distinct) shingle sets —
  * on arbitrary corpora with shared fragments, repeats, and sub-k docs.
  */
class JaccardPropertySpec extends SparkSpec {

  // tiny token vocabulary forces overlapping shingles between docs
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
  } yield toks.mkString(" ")

  private def shingleSet(text: String, k: Int): Set[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Set.empty
    else toks.sliding(k).map(w => HashFunctions.hash64Jvm(w.mkString(" "))).toSet
  }

  private def naive(docs: Seq[(Long, String)], k: Int,
      minJ: Double): Map[(Long, Long), Double] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t, k) }.toMap
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) intersect sets(b)).size
      if inter > 0
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      // same rounding (HALF_UP to 6) and same round-then-threshold order
      // as the engine, so boundary values agree
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= minJ
    } yield (a, b) -> jr).toMap
  }

  test("ngramJaccardPairs matches naive set Jaccard on arbitrary corpora") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(8, genDoc)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", shingleK = 2, minJaccard = 0.2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got == naive(docs, k = 2, minJ = 0.2)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
