package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphBasketSpec extends SparkSpec {

  import spark.implicits._

  test("triangleStats: K4 has 4 triangles, 12 wedges, clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val r = Graph.triangleStats(k4).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 12L)
    assert(r.getDouble(2) == 1.0)
  }

  test("triangleStats: a path has wedges but no triangles; clustering 0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Graph.triangleStats(path).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L && r.getDouble(2) == 0.0)
  }

  test("triangleStats: duplicates, reversed orientation and self-loops normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("a", "b")
    val r = Graph.triangleStats(messy).collect().head
    assert(r.getLong(0) == 1L, r.toString)
  }

  test("triangleStats: celebrity star + one closing edge counts exactly once") {
    // hub 0 connected to 1..10, plus edge (1,2): one triangle, wedges 46
    val star = ((1L to 10L).map(i => (0L, i)) :+ (1L, 2L)).toDF("a", "b")
    val r = Graph.triangleStats(star).collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 45L + 2L) // hub C(10,2) + wedge at 1 and at 2
  }

  test("linkPredict: distance-2 pairs only, exact Jaccard score, adjacents excluded") {
    // square 1-2-3-4-1: the two diagonals, each with cn=2 and score 1.0
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val sq = Graph.linkPredict(square).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sq == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
    // triangle + pendant: (1,4)/(2,4) reachable through 3; the triangle's
    // own edges must NOT appear (adjacent)
    val tp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.linkPredict(tp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((1L, 4L, 1L, 0.5), (2L, 4L, 1L, 0.5)))
  }

  test("linkPredict: hubMax drops hub-mediated wedges; true degrees in the score") {
    // path 1-2-3 plus hub h=9 wired to {1,3,4,5,6}: deg(9)=5, all others ≤2
    val g = Seq((1L, 2L), (2L, 3L), (9L, 1L), (9L, 3L), (9L, 4L),
      (9L, 5L), (9L, 6L)).toDF("a", "b")
    // uncapped: (1,3) has common neighbors {2, 9} → cn=2, score 2/(2+2-2)=1
    val un = Graph.linkPredict(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(un((1L, 3L)) == (2L, 1.0))
    assert(un.contains(4L -> 5L)) // hub-mediated pair exists uncapped
    // capped at 4: hub 9 is no longer a wedge center — (1,3) survives via
    // center 2 with cn=1 but TRUE degrees (2,2) → score 1/3; pure
    // hub-mediated pairs like (4,5) disappear entirely
    val cp = Graph.linkPredict(g, hubMax = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(cp((1L, 3L)) == (1L, 1.0 / 3.0))
    assert(!cp.contains(4L -> 5L))
    // a cap at/above the max degree is a no-op: identical result set
    val full = Graph.linkPredict(g, hubMax = 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = Graph.linkPredict(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(full == ref)
  }

  test("hubMaxFor: integer-exact ceil(sqrt(2E)), slack and floor respected") {
    assert(Graph.hubMaxFor(8L, floor = 1L) == 4L) // 2E=16, exact square
    assert(Graph.hubMaxFor(9L, floor = 1L) == 5L) // 2E=18 → ceil 5
    assert(Graph.hubMaxFor(0L, floor = 1L) == 1L)
    assert(Graph.hubMaxFor(9L, slack = 2.0, floor = 1L) == 10L)
    assert(Graph.hubMaxFor(9L) == 16L) // default floor dominates tiny graphs
  }

  test("wedgeCensus pins the capped candidate volume (candidateCounts pattern)") {
    // star hub 0 → 1..10 plus closing edge (1,2): E=11
    val star = ((1L to 10L).map(i => (0L, i)) :+ (1L, 2L)).toDF("a", "b")
    val r = Graph.wedgeCensus(star, hubMax = 5L).collect().head
    assert(r.getLong(0) == 11L) // centers_total = |V|
    assert(r.getLong(1) == 1L) // the hub
    assert(r.getLong(2) == 47L) // C(10,2) + 1 + 1
    assert(r.getLong(3) == 45L) // the hub's wedge mass
    assert(r.getDouble(4) == 45.0 / 47.0)
    // the surviving wedge mass respects the 2·E·hubMax fan-out bound
    assert(r.getLong(2) - r.getLong(3) <= 2L * 11L * 5L)
  }

  test("frequentPairs: counts, support, confidence, lift on a known basket set") {
    // baskets: {x,y,z}, {x,y}, {x,z}, {y} → pairs xy:2 xz:2 yz:1
    val bi = Seq((1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"),
      (3, "x"), (3, "z"), (4, "y")).toDF("bk", "it")
    val out = MarketBasket.frequentPairs(bi, "bk", "it", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z")))
    val (w, sup, conf, lift) = out(("x", "y"))
    assert(w == 2L && sup == 0.5) // 2 of 4 baskets
    assert(conf == 2.0 / 3.0) // x appears in 3 baskets
    assert(lift == (2.0 * 4) / (3L * 3L)) // y in 3 baskets
  }

  test("frequentPairs: duplicate items in a basket count once; basketMax drops mega-baskets") {
    val bi = (Seq((1, "x"), (1, "x"), (1, "y")) ++
      (1 to 30).map(i => (99, s"i$i"))).toDF("bk", "it")
    val out = MarketBasket.frequentPairs(bi, "bk", "it",
      minSupport = 1, basketMax = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("x", "y", 1L)))
  }

  test("frequentPairsRelative: threshold scales with basket count, floor 2") {
    // 10 baskets; xy co-occurs in 3, xz in 2
    val bi = ((1 to 3).flatMap(b => Seq((b, "x"), (b, "y"))) ++
      (4 to 5).flatMap(b => Seq((b, "x"), (b, "z"))) ++
      (6 to 10).map(b => (b, "solo"))).toDF("bk", "it")
    // frac 0.3 → thr = max(2, ceil(3)) = 3 → only xy survives
    val tight = MarketBasket.frequentPairsRelative(bi, "bk", "it",
      minSupportFrac = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tight == Set(("x", "y")))
    // frac 0.01 → ceil(0.1) = 1, but the floor keeps thr = 2 → xy and xz
    val floor = MarketBasket.frequentPairsRelative(bi, "bk", "it",
      minSupportFrac = 0.01)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(floor == Set(("x", "y"), ("x", "z")))
    // a 10× denser replica of the same catalog keeps the SAME survivors
    // under relative support (the absolute form would admit every pair)
    val dense = (1 to 10).flatMap(k =>
      Seq((k * 100 + 1, "x"), (k * 100 + 1, "y"), (k * 100 + 2, "x"),
        (k * 100 + 2, "y"), (k * 100 + 3, "x"), (k * 100 + 3, "y"),
        (k * 100 + 4, "x"), (k * 100 + 4, "z"), (k * 100 + 5, "x"),
        (k * 100 + 5, "z")) ++ (6 to 10).map(b => (k * 100 + b, "solo")))
      .toDF("bk", "it")
    val scaled = MarketBasket.frequentPairsRelative(dense, "bk", "it",
      minSupportFrac = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(scaled == Set(("x", "y")))
  }
}
