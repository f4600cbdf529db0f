package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: cosinePairs against a plain Scala bag-of-words cosine
  * on arbitrary corpora, with and without the df cap.
  */
class SparseSimPropertySpec extends SparkSpec {

  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def reference(docs: List[(Long, String)],
      maxDf: Long): Map[(Long, Long), Double] = {
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    }.toMap
    val df: Map[String, Int] =
      tf.values.flatMap(_.keys).toSeq.groupBy(identity).map { case (w, o) => w -> o.length }
    val capped = tf.map { case (id, m) =>
      id -> m.filter { case (w, _) => df(w) <= maxDf }
    }
    def norm(m: Map[String, Long]) = math.sqrt(m.values.map(c => c * c).sum.toDouble)
    (for {
      (a, ma) <- capped.toSeq; (b, mb) <- capped.toSeq
      if a < b
      dot = ma.keySet.intersect(mb.keySet).toSeq.map(w => ma(w) * mb(w)).sum
      if dot > 0
    } yield (a, b) -> BigDecimal(dot.toDouble / (norm(ma) * norm(mb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("cosinePairs matches the reference, capped and uncapped") {
    import spark.implicits._
    val prop = Prop.forAll(genDocs, Gen.oneOf(2L, 3L, Long.MaxValue)) { (docs, cap) =>
      val df = docs.toDF("doc_id", "text")
      val got = SparseSim.cosinePairs(df, "text", "doc_id",
        minSim = 0.0, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got == reference(docs, cap)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
