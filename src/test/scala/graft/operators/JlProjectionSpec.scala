package graft.operators

import graft.SparkSpec
import graft.functions.HashFunctions

/** JL sign projection: basis vectors read the sign matrix back out, and
  * identical vectors keep cosine 1 with zero distortion. */
class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projecting a basis vector yields that row of the sign matrix") {
    val dims = 8; val out = 4
    def basis(i: Int) = (0 until dims).map(j => if (j == i) 1f else 0f)
    val df = Seq((0L, basis(0)), (3L, basis(3))).toDF("vec_id", "embedding")
    val got = Similarity.jlProject(df, "embedding", "vec_id", out)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def sgn(j: Int, i: Int): Double =
      if (HashFunctions.hash64Jvm(s"jl:$j:$i") % 2 == 0) 1.0 else -1.0
    assert(got(0L) === (0 until out).map(j => sgn(j, 0)))
    assert(got(3L) === (0 until out).map(j => sgn(j, 3)))
  }

  test("identical pair keeps cosine 1 with zero distortion; opposite pair keeps -1") {
    val v = Seq(0.5f, -1.5f, 2f, 0.25f, -0.75f, 1f, -2f, 0.125f)
    val df = Seq(
      (0L, v), (1L, v),                 // identical pair (0,1)
      (2L, v), (3L, v.map(x => -x))     // antipodal pair (2,3)
    ).toDF("vec_id", "embedding")
    val got = Similarity.jlDistortion(df, "embedding", "vec_id",
      outDims = 4, dims = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got === Seq((0L, 1.0, 1.0, 0.0), (2L, -1.0, -1.0, 0.0)))
  }
}
