package graft

import org.apache.spark.sql.types._

/** Guard against testdata regeneration drift (the round-7 incident: the
  * driver regenerated `/root/testdata` with `timestamp[us]` ts columns and
  * the stale nanos-as-INT64 workaround in `Tables.events` broke 51 gates).
  * Every table is opened through its `Tables` loader and the POST-LOAD
  * logical schema asserted, so a future physical-encoding change becomes a
  * red local test instead of a lost round. */
class TablesSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def field(df: org.apache.spark.sql.DataFrame, name: String): DataType =
    df.schema(name).dataType

  test("events loader yields a usable timestamp regardless of physical encoding") {
    val ev = Tables.events(spark, dir)
    assert(field(ev, "ts") == TimestampType,
      s"events.ts must load as TimestampType, got ${field(ev, "ts")}")
    assert(field(ev, "event_id") == LongType)
    assert(field(ev, "user_id") == LongType)
    assert(field(ev, "event_type") == StringType)
    assert(field(ev, "value") == DoubleType)
    assert(field(ev, "props") == StringType)
    // and the column is actually computable: timestamp arithmetic + a scan
    import org.apache.spark.sql.functions._
    val n = ev.filter(col("ts") > lit("2020-01-01").cast(TimestampType))
      .agg(max(unix_timestamp(col("ts")))).collect()
    assert(n.nonEmpty)
  }

  test("lineitem/orders date columns load as a timestamp flavor") {
    val ok: DataType => Boolean =
      t => t == TimestampType || t == TimestampNTZType || t == DateType
    assert(ok(field(Tables.lineitem(spark, dir), "l_shipdate")))
    assert(ok(field(Tables.orders(spark, dir), "o_orderdate")))
  }

  test("embeddings.embedding loads as array<float>") {
    assert(field(Tables.embeddings(spark, dir), "embedding") ==
      ArrayType(FloatType, containsNull = true))
    assert(field(Tables.embeddings(spark, dir), "vec_id") == LongType)
  }

  test("documents loads with the contract columns") {
    val d = Tables.documents(spark, dir)
    assert(field(d, "doc_id") == LongType)
    assert(field(d, "text") == StringType)
    assert(field(d, "lang") == StringType)
    assert(field(d, "source") == StringType)
  }

  test("tpch key columns keep integral types") {
    assert(field(Tables.customer(spark, dir), "c_custkey") == LongType)
    assert(field(Tables.supplier(spark, dir), "s_suppkey") == LongType)
    assert(field(Tables.part(spark, dir), "p_partkey") == LongType)
    assert(field(Tables.lineitem(spark, dir), "l_orderkey") == LongType)
    assert(field(Tables.orders(spark, dir), "o_orderkey") == LongType)
    assert(field(Tables.nation(spark, dir), "n_nationkey") == IntegerType)
    assert(field(Tables.region(spark, dir), "r_regionkey") == IntegerType)
  }
}
