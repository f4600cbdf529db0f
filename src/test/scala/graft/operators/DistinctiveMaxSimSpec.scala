package graft.operators

import graft.SparkSpec

/** Hand-computed cases for the c-TF-IDF lift ranking and MaxSim late
  * interaction. */
class DistinctiveMaxSimSpec extends SparkSpec {
  import spark.implicits._

  test("distinctiveTerms: exact integer lift, per-group ranking") {
    // A: x×3 y×1 (T_A=4); B: y×3 z×1 (T_B=4); corpus: x=3 y=4 z=1 T=8
    val docs = Seq(("A", "x x x y"), ("B", "y y z y")).toDF("source", "text")
    val got = TextAnalysis.distinctiveTerms(docs, "text", "source",
      topK = 2, minCount = 1)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      ("A", 1, "x", 3L, 2.0),   // (3·8)/(4·3)
      ("A", 2, "y", 1L, 0.5),   // (1·8)/(4·4)
      ("B", 1, "z", 1L, 2.0),   // (1·8)/(4·1)
      ("B", 2, "y", 3L, 1.5)))  // (3·8)/(4·4)
  }

  test("maxSimScore: sum over queries of per-group best match") {
    def e(i: Int): Seq[Float] = (0 until 4).map(j => if (j == i) 1f else 0f)
    val vecs = Seq(
      (1, e(0)), (1, e(1)),  // group 1 spans e0, e1
      (2, e(0)), (2, e(2))   // group 2 spans e0, e2
    ).toDF("label", "embedding")
    val qs = Seq((0L, e(0)), (1L, e(2)))
    val got = Similarity.maxSimScore(vecs, "embedding", "label", qs, dims = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // group 1: best(e0)=1, best(e2)=0 → 1; group 2: 1 + 1 → 2
    assert(got === Map(1 -> 1.0, 2 -> 2.0))
  }
}
