package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Timestamp

/** Property test: buildScd2 against a plain Scala reference fold over
  * arbitrary update streams — interval chaining, collapse of identical
  * consecutive states, deterministic tie-breaks, exactly one current row
  * per key.
  */
case class ScdU(k: Long, t: Timestamp, id: Long, s: String, v: Double)

class ScdPropertySpec extends SparkSpec {
  private type U = ScdU
  private val U = ScdU

  private val genUpdates: Gen[List[U]] = for {
    n <- Gen.choose(1, 40)
    us <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 4L)
      // coarse timestamps force same-ts collisions → tie column matters
      sec <- Gen.choose(0L, 5L)
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.oneOf(1.0, 2.0)
    } yield (k, sec, s, v))
  } yield us.zipWithIndex.map { case ((k, sec, s, v), i) =>
    U(k, new Timestamp(1700000000000L + sec * 1000), i.toLong, s, v)
  }

  /** Reference: per key, sort by (t, id), collapse equal consecutive
    * states, chain intervals. */
  private def reference(us: List[U]): Set[(Long, String, Double, Int, String, String, Boolean)] = {
    def fmt(t: Timestamp): String =
      new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
        setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      }.format(t)
    us.groupBy(_.k).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(u => (u.t.getTime, u.id))
      val versions = sorted.foldLeft(List.empty[U]) { (acc, u) =>
        acc.headOption match {
          case Some(prev) if prev.s == u.s && prev.v == u.v => acc
          case _ => u :: acc
        }
      }.reverse
      versions.zipWithIndex.map { case (u, i) =>
        val to = if (i + 1 < versions.length) fmt(versions(i + 1).t) else null
        (k, u.s, u.v, i + 1, fmt(u.t), to, to == null)
      }
    }.toSet
  }

  test("buildScd2 matches a sequential reference fold on arbitrary streams") {
    import spark.implicits._
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val prop = Prop.forAll(genUpdates) { us =>
      val df = us.toDF("k", "t", "id", "s", "v")
      val got = Scd.buildScd2(df, "k", "t", "id", Seq("s", "v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getInt(3), r.getString(4),
          if (r.isNullAt(5)) null else r.getString(5), r.getBoolean(6)))
        .toSet
      got == reference(us)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("buildScd2 invariants: one current row per key, intervals chain") {
    import spark.implicits._
    val us = genUpdates.sample.get
    val rows = Scd.buildScd2(us.toDF("k", "t", "id", "s", "v"),
      "k", "t", "id", Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getInt(3),
        r.getString(4), Option(r.getString(5)), r.getBoolean(6)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.count(_._5) == 1)                       // exactly one current
      val byVersion = vs.sortBy(_._2)
      byVersion.sliding(2).foreach {
        case Array((_, _, _, Some(to), _), (_, _, from, _, _)) =>
          assert(to == from)                            // valid_to chains to next valid_from
        case _ => ()
      }
      assert(byVersion.last._4.isEmpty)                 // open-ended tail
    }
  }
}
