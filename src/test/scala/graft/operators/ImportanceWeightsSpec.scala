package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR-style importance scores: identity when target == corpus,
  * unscorable single-token docs, and target-affinity ordering. */
class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("target == corpus makes every lift exactly 1") {
    val docs = Seq(
      (1L, "alpha beta gamma", true),
      (2L, "beta gamma delta", true),
      (3L, "x", true) // one token → no bigram → unscorable
    ).toDF("doc_id", "text", "is_t")
    val got = Sampling.importanceWeights(docs, "text", "doc_id", "is_t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got(1L) === ((2L, Some(1.0))))
    assert(got(2L) === ((2L, Some(1.0))))
    assert(got(3L) === ((0L, None)))
  }

  test("documents made of target-domain bigrams outscore off-domain ones") {
    // target docs repeat "aa bb"; off-domain docs repeat "cc dd"
    val docs = Seq(
      (1L, "aa bb aa bb", true),
      (2L, "aa bb aa bb", true),
      (3L, "cc dd cc dd", false),
      (4L, "aa bb aa bb", false), // target-flavored but outside the domain
      (5L, "cc dd cc dd", false)
    ).toDF("doc_id", "text", "is_t")
    val got = Sampling.importanceWeights(docs, "text", "doc_id", "is_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(4L) === got(1L)) // score depends on content, not membership
    assert(got(4L) > got(3L))
    assert(got(3L) === got(5L))
  }
}
