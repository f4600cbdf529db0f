package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at write time — joins between
  * tables bucketed the same way need NO shuffle (the 100 TB strategy for
  * repeated joins on the same key, e.g. memories x provenance).
  */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables runs without a shuffle exchange") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucketed_l")
      (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucketed_r")
      val joined = spark.table("graft_bucketed_l")
        .join(spark.table("graft_bucketed_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_r")
    }
  }
}
