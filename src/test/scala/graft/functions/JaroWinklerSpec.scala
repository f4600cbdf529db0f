package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the [[JaroWinkler]] scalar against the externally-verified
  * values (probed from DuckDB's jaro_winkler_similarity, the ER oracle
  * engine) and the expression's SQL/codegen plumbing. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = JaroWinkler.jw(a, b)

  test("textbook values match the oracle engine bit-for-bit") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("hello", "hallo") == 0.88)
    assert(jw("Customer#000001", "Customer#000010") == 0.9866666666666667)
    assert(jw("ab", "abcdefgh") == 0.8)
  }

  test("edge semantics: empties are 0, no window is exact-position, identity is 1") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: only same-position matches
    assert(jw("x", "x") == 1.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("winkler boost gates at jaro > 0.7 and caps the prefix at 4") {
    // jaro = 2/3 <= 0.7 with a full 4-prefix: boost must NOT apply
    assert(jw("abcdXXXX", "abcdYYYY") == 0.6666666666666666)
    // prefix 4 of a 6-char match: + 4·0.1·(1−jaro)
    assert(jw("abcdef", "abcdfe") == 0.9666666666666667)
    // odd aligned-mismatch count truncates (t = 3/2 = 1; no common
    // prefix, so the boost is a no-op and the jaro shows through)
    assert(jw("abcdef", "cabdef") == 0.9444444444444445)
  }

  test("symmetry and bounds on arbitrary pairs") {
    val ss = Seq("", "a", "ab", "abc", "Customer#1", "Customer#2",
      "red widget", "red widgit", "blue bolt")
    for (a <- ss; b <- ss) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"$a/$b out of range: $s")
      assert(s == jw(b, a), s"$a/$b asymmetric")
    }
  }

  test("column form and SQL registration agree with the scalar; nulls propagate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("hello", "hallo"))
      .toDF("a", "b")
      .withColumn("s_col", JaroWinkler.sim(col("a"), col("b")))
      .withColumn("s_sql", expr("jaro_winkler(a, b)"))
    df.collect().foreach { r =>
      val expect = jw(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == expect && r.getDouble(3) == expect)
    }
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.sim(col("a"), col("b")).as("s"))
      .collect()
    assert(nulls.head.isNullAt(0))
  }
}
