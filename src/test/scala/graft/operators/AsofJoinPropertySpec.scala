package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the window-based as-of join agrees with the naive
  * reference semantics (per left row: argmax over right rows with
  * rt <= lt, ties by max tieBreak) on arbitrary inputs — including
  * duplicate timestamps on both sides, empty keys, keys that exist on
  * only one side, and NULL keys/timestamps on either side (a NULL never
  * matches anything, exactly like the rt <= lt predicate / DuckDB ASOF).
  */
class AsofJoinPropertySpec extends SparkSpec {

  private case class L(k: Option[Int], t: Option[Long], lid: Long)
  private case class R(k: Option[Int], t: Option[Long], rid: Long, v: Double)

  // tiny domains force collisions: few keys, few timestamps, ~1/7 nulls
  private def opt[T](g: Gen[T]): Gen[Option[T]] =
    Gen.frequency((1, Gen.const(None)), (6, g.map(Some(_))))
  private val genL: Gen[L] = for {
    k <- opt(Gen.choose(0, 3)); t <- opt(Gen.choose(0L, 12L))
    id <- Gen.choose(0L, 999L)
  } yield L(k, t, id)
  private val genR: Gen[R] = for {
    k <- opt(Gen.choose(0, 3)); t <- opt(Gen.choose(0L, 12L))
    id <- Gen.choose(0L, 999L)
  } yield R(k, t, id, id * 0.5)

  private def reference(ls: Seq[L], rs: Seq[R]): Map[Long, Option[Long]] =
    ls.map { l =>
      val m = rs.filter { r =>
        (for { lk <- l.k; rk <- r.k; lt <- l.t; rt <- r.t }
          yield rk == lk && rt <= lt).getOrElse(false)
      }.sortBy(r => (r.t.get, r.rid)).lastOption
      l.lid -> m.map(_.rid)
    }.toMap

  test("asofLe matches naive argmax semantics on arbitrary inputs with nulls") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(
      Gen.listOfN(40, genL), Gen.listOfN(40, genR)) { (ls0, rs0) =>
      // unique ids per side keep the comparison keyed; duplicate (k,t) stay
      val ls = ls0.zipWithIndex.map { case (l, i) => l.copy(lid = i.toLong) }
      val rs = rs0.zipWithIndex.map { case (r, i) => r.copy(rid = i.toLong) }
      val ldf = ls.map(l => (l.k, l.t, l.lid)).toDF("k", "t", "lid")
      val rdf = rs.map(r => (r.k, r.t, r.rid, r.v)).toDF("k", "rt", "rid", "rv")
      val got = AsofJoin.asofLe(ldf, rdf, Seq("k"), "t", "rt", "rid",
        Seq("rid", "rv"))
        .collect()
        .map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      got == reference(ls, rs)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}
