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
}
