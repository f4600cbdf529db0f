package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the NSW graph-ANN tier: the per-node degree cap with its
  * deterministic tie-break, and the beam traversal's hop-bounded reach
  * (a node r hops from the entry is only found once rounds ≥ r).
  */
class NswSpec extends SparkSpec {
  import spark.implicits._

  test("nswGraph: per-src cap m with id tie-break on equal scores") {
    // identical vectors share every RHP bucket and score 1.0 pairwise,
    // so the m-cap's ORDER BY (s DESC, dst) resolves purely by id
    val v = Seq.fill(5)(Seq.fill(8)(0.5f)).zipWithIndex
      .map { case (vec, i) => (i.toLong, vec) }
      .toDF("vec_id", "embedding")
    val g = Similarity.nswGraph(v, "embedding", "vec_id", m = 2, dims = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    assert(g.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(g.values.forall(_.size == 2))
    assert(g(0L) == Set(1L, 2L)) // smallest ids win the tie
    assert(g(3L) == Set(0L, 1L))
  }

  test("nswSearch: reach is hop-bounded by rounds; beam finds the far optimum") {
    // chain 1 → 2 → 3 in the graph; 3 IS the query direction (score 1),
    // 2 is closer than 1. One round can only see 2; two rounds reach 3.
    val vecs = Seq(
      (1L, Seq(0f, 1f, 0f, 0f)),       // cos(q) = 0
      (2L, Seq(1f, 1f, 0f, 0f)),       // cos(q) ≈ 0.707
      (3L, Seq(1f, 0f, 0f, 0f)))       // cos(q) = 1
      .toDF("vec_id", "embedding")
    val graph = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val q = Seq(1f, 0f, 0f, 0f)
    def top(rounds: Int) = Similarity.nswSearch(graph, vecs, "embedding",
      "vec_id", q, k = 1, beam = 2, rounds = rounds, entryId = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    assert(top(1) == ((2L, 0.707107)))
    assert(top(2) == ((3L, 1.0)))
  }
}
