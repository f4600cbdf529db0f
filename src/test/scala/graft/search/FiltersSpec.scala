package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FiltersSpec extends SparkSpec {
  import Filters._

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "click", Some(10.0), Some(Timestamp.valueOf("2024-01-05 00:00:00")), Some("Alpha Beta")),
      (2L, "view", Some(20.0), Some(Timestamp.valueOf("2024-01-15 00:00:00")), Some("gamma")),
      (3L, "purchase", None, None, None))
      .toDF("id", "tool", "value", "timestamp", "note")
  }

  private def ids(fs: FilterSpec*): Set[Long] =
    df.where(compileAll(fs)).select("id").collect().map(_.getLong(0)).toSet

  test("is / is_not (null-safe: is_not keeps rows where field is absent)") {
    assert(ids(FilterSpec("tool", "is", SV("click"))) == Set(1L))
    assert(ids(FilterSpec("value", "is_not", NV(10.0))) == Set(2L, 3L))
  }

  test("before / after on numerics and timestamps (Z-suffix tolerated)") {
    assert(ids(FilterSpec("value", "after", NV(15.0))) == Set(2L))
    assert(ids(FilterSpec("timestamp", "before", SV("2024-01-10T00:00:00Z"))) == Set(1L))
    assert(ids(FilterSpec("timestamp", "after", SV("2024-01-10T00:00:00"))) == Set(2L))
  }

  test("between is inclusive") {
    assert(ids(FilterSpec("value", "between", RV(NV(10.0), NV(20.0)))) == Set(1L, 2L))
  }

  test("contains is tokenized MatchText; contains_substring is the raw form") {
    // case-insensitive whole-token match (subsumes the 3-variant OR)
    assert(ids(FilterSpec("note", "contains", SV("ALPHA"))) == Set(1L))
    // token boundary: "mm" occurs inside "gamma" but is not a whole token
    assert(ids(FilterSpec("note", "contains", SV("mm"))) == Set.empty[Long])
    assert(ids(FilterSpec("note", "contains_substring", SV("mm"))) == Set(2L))
    // multi-token query: every token must appear (MatchText AND semantics)
    assert(ids(FilterSpec("note", "contains", SV("beta ALPHA"))) == Set(1L))
    assert(ids(FilterSpec("note", "contains", SV("alpha gamma"))) == Set.empty[Long])
    // non-string values match as text of their rendering (MatchText(str(v)))
    // — integral doubles render like JSON ints: "6", not "6.0"
    import spark.implicits._
    val digits = Seq((1L, "k 6"), (2L, "k 60"), (3L, "k 6.5")).toDF("id", "note")
    def dids(f: FilterSpec) =
      digits.where(compile(f)).select("id").collect().map(_.getLong(0)).toSet
    // "6" (not "6.0") as the token — matches "6" and the "6" inside
    // "6.5" (the word tokenizer splits on '.'), but never "60"
    assert(dids(FilterSpec("note", "contains", NV(6.0))) == Set(1L, 3L))
    assert(dids(FilterSpec("note", "contains", NV(6.5))) == Set(3L))
  }

  test("any_of and conjunction of filters") {
    assert(ids(FilterSpec("tool", "any_of", AV(Seq("click", "view")))) == Set(1L, 2L))
    assert(ids(
      FilterSpec("tool", "any_of", AV(Seq("click", "view"))),
      FilterSpec("value", "after", NV(15.0))) == Set(2L))
  }

  test("empty filter list compiles to TRUE") {
    assert(ids() == Set(1L, 2L, 3L))
  }

  test("field mapping resolves API names to payload paths") {
    assert(Filters.fieldMap("agent_id") == "meta.agent_id")
  }

  test("invalid specs raise, mirroring the reference's validation") {
    intercept[IllegalArgumentException](compile(FilterSpec("tool", "nope", SV("x"))))
    intercept[IllegalArgumentException](compile(FilterSpec("v", "between", NV(1.0))))
    intercept[IllegalArgumentException](compile(FilterSpec("v", "contains", AV(Seq("x")))))
    intercept[IllegalArgumentException](compile(FilterSpec("v", "any_of", SV("x"))))
  }
}
