package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {

  test("native cosine is bit-identical to the HOF and unrolled forms (floats)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (1 to 200).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextFloat() * 2 - 1),
        Seq.fill(16)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    val rows = df.select(
      CosineSim(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"),
      VectorFunctions.cosineUnrolled(col("a"), col("b"), 16).as("unrolled"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "native != hof")
      assert(r.getDouble(0) == r.getDouble(2), "native != unrolled")
    }
  }

  test("double arrays and mixed float/double element types work") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val got = df.select(CosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - 1.0 / 3.0) < 1e-12)
  }

  test("zero vector and null input yield null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 0.0f))),
      (None, Some(Seq(1.0f, 1.0f))))
      .toDF("a", "b")
    val rows = df.select(CosineSim(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("mismatched lengths and null elements yield null, like the Column forms") {
    import spark.implicits._
    val mismatch = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(CosineSim(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0), "length mismatch must be null, not truncated")
    val nullElem = Seq((Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
      .select(CosineSim(col("a"), col("b"))).head()
    assert(nullElem.isNullAt(0), "null element must be null, not read as 0")
  }

  test("non-array input is an analysis error") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(CosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("cosine_sim") || e.getMessage.contains("ARRAY"))
  }
}
