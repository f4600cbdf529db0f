package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: when the top-M lists cover the whole candidate set (m ≥ n),
  * the pruned scale-path fusion [[Search.rrfFuseTopM]] produces EXACTLY the
  * scores of the exact global-window form [[Search.rrfFuse]] — including
  * under duplicate scores on both rankings (where only the shared
  * deterministic tie-break keeps the two implementations aligned).
  */
class RrfPropertySpec extends SparkSpec {

  private case class Cand(id: Long, dense: Double, kw: Double)

  // few distinct score values force heavy ties
  private val genCand: Gen[Cand] = for {
    d <- Gen.choose(0, 4); w <- Gen.choose(0, 4)
  } yield Cand(0L, d / 4.0, w / 4.0)

  test("rrfFuseTopM with full coverage equals the exact global fusion") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(30, genCand)) { cs0 =>
      val cs = cs0.zipWithIndex.map { case (c, i) => c.copy(id = i.toLong) }
      val df = cs.map(c => (c.id, c.dense, c.kw)).toDF("id", "dense", "kw")
      def scores(out: org.apache.spark.sql.DataFrame): Map[Long, Double] = out
        .select(col("id"), round(col("score"), 9).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exact = scores(Search.rrfFuse(df, col("dense"), col("kw"), col("id")))
      val pruned = scores(Search.rrfFuseTopM(df, col("dense"), col("kw"),
        col("id"), m = cs.length))
      exact == pruned
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("rrfFuseTopMScores equals rrfFuseTopM on list members, and covers them all") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(Gen.listOfN(25, genCand)) { cs0 =>
      val cs = cs0.zipWithIndex.map { case (c, i) => c.copy(id = i.toLong) }
      val df = cs.map(c => (c.id, c.dense, c.kw)).toDF("id", "dense", "kw")
      val m = 8
      val full = Search.rrfFuseTopM(df, col("dense"), col("kw"), col("id"), m)
        .select(col("id"), round(col("score"), 9).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val idsOnly = Search.rrfFuseTopMScores(df, col("dense"), col("kw"),
        col("id"), m)
        .select(col("tb"), round(col("score"), 9).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // every returned row matches the full form's score, every nonzero
      // scorer of the full form is present, nothing else is
      idsOnly.forall { case (id, sc) => full(id) == sc } &&
        full.filter(_._2 > 0).keySet == idsOnly.keySet
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
