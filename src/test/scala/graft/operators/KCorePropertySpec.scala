package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: R-round kCorePeel equals a naive in-memory peel of the same
  * depth on arbitrary small graphs, and with R large enough it reaches
  * the true fixpoint (further rounds are no-ops). */
class KCorePropertySpec extends SparkSpec {

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(0, 14)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 7L); b <- Gen.choose(1L, 7L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.distinct

  private def naivePeel(edges: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    var e = edges
    (0 until rounds).foreach { _ =>
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
  }

  test("kCorePeel matches the naive peel; depth 7 is a fixpoint on 7 nodes") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(genEdges) { edges =>
      val df = edges.toDF("a", "b")
      def run(r: Int): Map[Long, Long] =
        Graph.kCorePeel(df, k = 2, rounds = r)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val r2 = run(2)
      // each peel round can only remove nodes, so 7 rounds on ≤7 nodes is
      // the fixpoint; an 8th round must change nothing
      val r7 = run(7)
      val r8 = run(8)
      r2 == naivePeel(edges, 2, 2) && r7 == naivePeel(edges, 2, 7) && r7 == r8
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
