package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the mutual-kNN neighbor graph — the answer-bounded
  * alternative to ε-threshold pairs:
  *  - undirected degree ≤ k for EVERY vector (the worst-case bound the
  *    operator exists to provide),
  *  - every edge is mutual (each endpoint ranks the other in its top-k),
  *  - edges are canonical (a < b) and floored (s ≥ minCosine),
  *  - on well-separated clusters the graph is exactly the within-cluster
  *    cliques, and the bucketed scale path reproduces the exact form
  *    bit-for-bit (identical vectors always co-bucket — same signs).
  */
class MutualKnnSpec extends SparkSpec {

  private val dims = 8

  // 4 well-separated clusters × 4 identical vectors: within-cluster
  // cosine = 1.0, cross-cluster ≈ 0 (orthogonal one-hot directions)
  private def clustered() = {
    import spark.implicits._
    (0L until 16L).map { id =>
      val c = (id / 4).toInt
      val v = Array.fill(dims)(0.01f)
      v(c * 2) = 1.0f
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("exact: degree <= k, mutual, canonical, floored") {
    val e = clustered()
    val pairs = Similarity.mutualKnnPairs(e, "embedding", "vec_id",
      k = 2, minCosine = 0.5, dims = dims)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "a < b")
    assert(rows.forall(_.getDouble(2) >= 0.5), "minCosine floor")
    val deg = pairs.select(col("a").as("v"))
      .unionAll(pairs.select(col("b").as("v")))
      .groupBy("v").count().collect()
    assert(deg.forall(_.getLong(1) <= 2), s"degree cap: ${deg.mkString(",")}")
  }

  test("well-separated clusters: exactly the within-cluster cliques") {
    val e = clustered()
    // k = 3 = cluster size − 1 → each member keeps exactly its cluster
    val pairs = Similarity.mutualKnnPairs(e, "embedding", "vec_id",
      k = 3, minCosine = 0.5, dims = dims)
    val got = pairs.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      c <- 0L until 4L
      i <- 0L until 4L
      j <- (i + 1) until 4L
    } yield (c * 4 + i, c * 4 + j)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("bucketed scale path reproduces the exact graph on co-bucketing input") {
    val e = clustered()
    val exact = Similarity.mutualKnnPairs(e, "embedding", "vec_id",
      k = 3, minCosine = 0.5, dims = dims)
      .select("a", "b", "s").collect().map(_.toSeq).toSet
    // identical vectors share every hyperplane sign, so within-cluster
    // candidates are complete at ANY planes/seed choice
    val bucketed = Similarity.mutualKnnPairsBucketed(e, "embedding",
      "vec_id", k = 3, minCosine = 0.5, planes = 4, seeds = Seq(7, 21),
      dims = dims)
      .select("a", "b", "s").collect().map(_.toSeq).toSet
    assert(bucketed == exact)
  }

  test("descent recovers the full cliques from a sparse path seed") {
    import spark.implicits._
    val e = clustered()
    // seed: one directed path per cluster (3 of 6 undirected edges) —
    // two rounds of undirected 1-hop ∪ 2-hop proposals must rebuild the
    // complete directed top-3 graph, including for the path TAIL whose
    // only seed edge points AT it (the reverse-proposal case)
    val g0 = (for { c <- 0L until 4L; i <- 0L until 3L }
      yield (c * 4 + i, c * 4 + i + 1, 1.0)).toDF("q", "b", "s")
    val g2 = Similarity.knnGraphDescent(e, "embedding", "vec_id", g0,
      k = 3, minCosine = 0.5, rounds = 2, dims = dims)
    val exact = Similarity.knnGraphExact(e, "embedding", "vec_id",
      e, k = 3, minCosine = 0.5, dims = dims)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("q", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges(g2) == edges(exact))
    assert(edges(g2).size == 16 * 3) // every vector keeps its 3 clique mates
  }

  test("isolated vector goes noise: the floor keeps far neighbors out") {
    import spark.implicits._
    // one outlier orthogonal-ish to everything
    val e = clustered().unionAll(
      Seq((99L, Seq(0.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f)))
        .toDF("vec_id", "embedding"))
    val pairs = Similarity.mutualKnnPairs(e, "embedding", "vec_id",
      k = 3, minCosine = 0.5, dims = dims)
    assert(!pairs.where(col("a") === 99L || col("b") === 99L).collect()
      .exists(_ => true), "outlier must have no edges above the floor")
  }
}
