package graft.search

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the compiled Column filter algebra agrees with a plain
  * Scala reference evaluation on arbitrary filter conjunctions over
  * arbitrary rows (SURVEY §5 test plan).
  */
class FiltersPropertySpec extends SparkSpec {
  import Filters._

  case class R(id: Long, tool: String, value: Option[Double])

  private val tools = Seq("click", "view", "purchase", "scroll")

  private val genRow: Gen[R] = for {
    id <- Gen.choose(0L, 1000L)
    tool <- Gen.oneOf(tools)
    v <- Gen.option(Gen.choose(-50.0, 150.0).map(d => math.rint(d * 10) / 10))
  } yield R(id, tool, v)

  private val genFilter: Gen[FilterSpec] = Gen.oneOf(
    Gen.oneOf(tools).map(t => FilterSpec("tool", "is", SV(t))),
    Gen.oneOf(tools).map(t => FilterSpec("tool", "is_not", SV(t))),
    Gen.choose(-60.0, 160.0).map(v => FilterSpec("value", "before", NV(v))),
    Gen.choose(-60.0, 160.0).map(v => FilterSpec("value", "after", NV(v))),
    for {
      lo <- Gen.choose(-60.0, 100.0); hi <- Gen.choose(lo, 160.0)
    } yield FilterSpec("value", "between", RV(NV(lo), NV(hi))),
    Gen.someOf(tools).map(ts => FilterSpec("tool", "any_of", AV(ts.toSeq))),
    // tokenized: whole tokens hit, fragments miss
    Gen.oneOf("li", "VIEW", "purchase", "x", "click scroll")
      .map(sub => FilterSpec("tool", "contains", SV(sub))),
    Gen.oneOf("li", "VIEW", "pur", "x")
      .map(sub => FilterSpec("tool", "contains_substring", SV(sub))))

  /** Reference semantics, mirroring the reference engine's operators
    * (SQL three-valued logic: comparisons on a missing value are not
    * satisfied; is_not keeps rows where the field is absent). */
  private def evalOne(r: R, f: FilterSpec): Boolean = (f.field, f.op, f.value) match {
    case ("tool", "is", SV(s)) => r.tool == s
    case ("tool", "is_not", SV(s)) => r.tool != s
    case ("tool", "any_of", AV(vs)) => vs.contains(r.tool)
    case ("tool", "contains", SV(s)) =>
      // independent MatchText twin: all query tokens ⊆ field tokens
      val toks = r.tool.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).forall(toks)
    case ("tool", "contains_substring", SV(s)) =>
      r.tool.toLowerCase.contains(s.toLowerCase)
    case ("value", "before", NV(v)) => r.value.exists(_ < v)
    case ("value", "after", NV(v)) => r.value.exists(_ > v)
    case ("value", "between", RV(NV(lo), NV(hi))) => r.value.exists(x => x >= lo && x <= hi)
    case other => sys.error(s"unhandled $other")
  }

  test("compiled filter conjunctions match reference semantics") {
    import spark.implicits._
    val prop = Prop.forAllNoShrink(
      Gen.listOfN(60, genRow), Gen.listOfN(3, genFilter)) { (rows, fs) =>
      val df = rows.map(r => (r.id, r.tool, r.value)).toDF("id", "tool", "value")
      val got = df.where(compileAll(fs))
        .select("id", "tool", "value").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = rows.filter(r => fs.forall(f => evalOne(r, f)))
        .map(r => (r.id, r.tool, r.value))
        .groupBy(identity).view.mapValues(_.size).toMap
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
