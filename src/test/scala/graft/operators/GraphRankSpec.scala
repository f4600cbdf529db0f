package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the integer fixed-point PageRank algebra and the determinized
  * label-propagation rules against hand-computed fixed points, plus the
  * partitioning-independence that the integer carrier buys.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L
  private val T = 150000000000L // (100-85)·S/100

  test("pageRank round 1 on a path graph matches hand arithmetic") {
    // 1-2-3: deg 1,2,1. shares: 1→2:S, 2→{1,3}:S/2, 3→2:S.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.pageRank(edges, rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == T + 85L * (S / 2) / 100)
    assert(r(2L) == T + 85L * (2 * S) / 100)
    assert(r(3L) == r(1L))
  }

  test("pageRank conserves mass within the floor-leak bound and is partition-stable") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val a = Graph.pageRank(edges, rounds = 3)
    val b = Graph.pageRank(edges.repartition(7, col("b")), rounds = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // total mass stays within [N·teleport, N·scale]; floor leaks only down
    val total = a.agg(sum("rank_units")).collect()(0).getLong(0)
    assert(total <= 4 * S && total > 4 * T)
  }

  test("trustRank: trust decays with distance from the seed, unreachable stays 0") {
    // 1-2-3 path seeded at 1; 10-11 disconnected from the seed.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("node")
    val r2 = Graph.trustRank(edges, seeds, rounds = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hand-rolled: r1 = (T, 85S/100, 0); r2 below
    assert(r2(1L) == T + 85L * (85L * S / 100 / 2) / 100)
    assert(r2(2L) == 85L * T / 100)
    assert(r2(3L) == 85L * (85L * S / 100 / 2) / 100)
    assert(r2(10L) == 0L && r2(11L) == 0L)
  }

  test("localClustering: closed triangle is 1.0, pendant nodes are null") {
    // triangle {1,2,3} plus pendant 4 on node 1
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.localClustering(g).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), Option(x.get(3))))).toMap
    assert(r(1L) == ((3L, 1L, Some(0.333333)))) // 1 of 3 neighbor pairs closed
    assert(r(2L) == ((2L, 1L, Some(1.0))))
    assert(r(3L) == ((2L, 1L, Some(1.0))))
    assert(r(4L) == ((1L, 0L, None))) // no wedge at a pendant
  }

  test("kTrussPeel: triangle survives, tendrils and star spam do not") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val t = Graph.kTrussPeel(g, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L))
    // a pure star is triangle-free: deg-huge hub, empty truss
    val star = (2L to 20L).map(i => (1L, i)).toDF("a", "b")
    assert(Graph.kTrussPeel(star, k = 3, rounds = 1).isEmpty)
  }

  test("kTrussPeel: exact supports on a hub-skewed graph (oriented enumeration)") {
    // hub 0 — leaves 1..10, plus path edges (1,2) and (2,3): triangles
    // (0,1,2) and (0,2,3) close THROUGH the hub, so the oriented
    // enumeration (which never centers a wedge on the hub) must still
    // count every hub edge's support exactly; degree ties (1 vs 3 both
    // deg 2) exercise the id tie-break
    val g = ((1L to 10L).map(i => (0L, i)) ++ Seq((1L, 2L), (2L, 3L)))
      .toDF("a", "b")
    val t = Graph.kTrussPeel(g, k = 3, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      (0L, 1L) -> 1L, (0L, 2L) -> 2L, (0L, 3L) -> 1L,
      (1L, 2L) -> 1L, (2L, 3L) -> 1L))
  }

  test("assortativity of a perfect star is -1") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.assortativity(star).collect()(0)
    assert(r.getAs[Long]("m") == 6L && r.getAs[Long]("s_x") == 12L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("labelCommunities: pendant joins the triangle by round 3; ties go to min label") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val r1 = Graph.labelCommunities(edges, rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: node 1 sees labels {2,3,4} all once → min 2; others see 1
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val r3 = Graph.labelCommunities(edges, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3.values.toSet == Set(1L))
  }

  test("bfsDistances: hop counts from the seed, min over multiple seeds, horizon cuts") {
    // path 1-2-3-4-5 plus disconnected 10-11; seeds {1, 5}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val seeds = Seq(1L, 5L).toDF("node")
    val d = Graph.bfsDistances(edges, seeds, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 3 is 2 hops from both seeds; 10/11 unreachable → absent
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    // horizon 1: only the seeds' direct neighborhood is known
    val d1 = Graph.bfsDistances(edges, seeds, rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L))
    // partition-stability: integer hops can't drift with layout
    val d7 = Graph.bfsDistances(edges.repartition(7, col("b")), seeds, 3)
    assert(Graph.bfsDistances(edges, seeds, 3).exceptAll(d7).isEmpty)
  }

  test("hits: round-1 hand arithmetic on a directed bipartite graph; max holds scale") {
    // hubs {1,2} → authorities {10,11,12}: 1→{10,11}, 2→{10,12}
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L)).toDF("src", "dst")
    val S = 1000000L
    val r = Graph.hits(e, rounds = 1).collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    // a_raw: 10→2S, 11→S, 12→S; max-normalized: 10→S, 11/12→S/2
    assert(r((10L, "authority")) == S)
    assert(r((11L, "authority")) == S / 2 && r((12L, "authority")) == S / 2)
    // h_raw: 1→S+S/2, 2→S+S/2 → both normalize to exactly S
    assert(r((1L, "hub")) == S && r((2L, "hub")) == S)
    // the argmax side always holds exactly `scale` units
    val r2 = Graph.hits(e, rounds = 2)
    assert(r2.groupBy(col("side")).agg(max("units")).collect()
      .forall(_.getLong(1) == S))
  }
}
