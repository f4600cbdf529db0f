package graft.operators

import graft.SparkSpec

/** k-core peel on a constructed graph: a clique survives, tendrils peel,
  * and a star center needs the SECOND round to fall. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("3-core of clique + tendrils + star") {
    val edges = Seq(
      // 4-clique: every node degree 3 → the 3-core
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      // tendril hanging off the clique
      (1L, 5L), (5L, 6L),
      // star: center 7 has degree 3 but all leaves are degree 1 —
      // leaves fall in round 1, the center only in round 2
      (7L, 8L), (7L, 9L), (7L, 10L)
    ).toDF("a", "b")
    val got = Graph.kCorePeel(edges, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("one round is NOT enough — the second peel removes survivors of the first") {
    // 7-8-9-10 fan: degrees 7:3, 9:3, 8:2, 10:2 — round 1 keeps {7,9}
    // with edge (7,9) between them; round 2 peels that remnant too
    val edges = Seq((7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (9L, 10L))
      .toDF("a", "b")
    val r1 = Graph.kCorePeel(edges, k = 3, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(7L -> 1L, 9L -> 1L))
    val r2 = Graph.kCorePeel(edges, k = 3, rounds = 2)
      .collect()
    assert(r2.isEmpty)
  }
}
