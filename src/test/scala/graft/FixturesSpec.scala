package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift guard. Round 9 lost four green queries to a
  * silent regeneration of `/root/testdata` (events.ts INT64-nanos →
  * TIMESTAMP(MICROS)); this spec turns the next regeneration into one
  * obvious red test whose message names the adapter to update, instead
  * of four analysis-time failures deep inside the driver's gate.
  *
  * Assertions are deliberately about CONTRACTS, not exact layouts:
  * where the engine adapts (events.ts may be BIGINT nanos or a
  * timestamp — `Relational.events` branches), the guard accepts the
  * whole adapted set and fails only on a type outside it.
  */
class FixturesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def schemaOf(table: String): StructType =
    spark.read.parquet(s"$dir/$table.parquet").schema

  private def assertField(table: String, schema: StructType, name: String,
      accept: DataType => Boolean, expected: String, adapter: String): Unit = {
    val f = schema.fields.find(_.name == name).getOrElse(
      fail(s"$table.parquet lost column '$name' — update $adapter"))
    assert(accept(f.dataType),
      s"$table.$name arrived as ${f.dataType} (expected $expected) — " +
        s"the fixture was regenerated with a new layout; update $adapter")
  }

  test("events: adapted columns keep types Relational.events understands") {
    val s = schemaOf("events")
    assertField("events", s, "ts",
      { case LongType | TimestampType | TimestampNTZType => true; case _ => false },
      "BIGINT nanos or TIMESTAMP[_NTZ] micros",
      "graft.ops.Relational.events (the schema-adaptive ts_ns branch)")
    assertField("events", s, "event_id", _ == LongType, "BIGINT", "Relational.events callers")
    assertField("events", s, "user_id", _ == LongType, "BIGINT", "Relational.events callers")
    assertField("events", s, "event_type", _ == StringType, "STRING", "Relational.events callers")
    assertField("events", s, "value", _ == DoubleType, "DOUBLE", "Relational.events callers")
    assertField("events", s, "props", _ == StringType, "JSON STRING", "Relational.eventProps")
  }

  test("documents: the corpus stand-in keeps the (doc_id, text, lang, source) contract") {
    val s = schemaOf("documents")
    assertField("documents", s, "doc_id", _ == LongType, "BIGINT", "SparkEntry.docs")
    assertField("documents", s, "text", _ == StringType, "STRING", "SparkEntry.docs")
    assertField("documents", s, "lang", _ == StringType, "STRING", "q_stratified / langId")
    assertField("documents", s, "source", _ == StringType, "STRING",
      "SparkEntry.withDomain / Sampling mixture ops")
    assertField("documents", s, "n_chars",
      { case LongType | IntegerType => true; case _ => false }, "BIGINT/INT",
      "TextAnalysis length signals")
  }

  test("embeddings: vector column stays a float/double array") {
    val s = schemaOf("embeddings")
    assertField("embeddings", s, "vec_id", _ == LongType, "BIGINT", "Similarity ops")
    assertField("embeddings", s, "embedding",
      { case ArrayType(FloatType | DoubleType, _) => true; case _ => false },
      "ARRAY<FLOAT|DOUBLE>", "graft.ops.Similarity.asDouble")
    assertField("embeddings", s, "label",
      { case IntegerType | LongType => true; case _ => false }, "INT/BIGINT",
      "Similarity.labelCentroids")
  }

  test("TPC-H tables: the key/measure columns the relational queries touch") {
    val li = schemaOf("lineitem")
    Seq("l_orderkey" -> "joins", "l_partkey" -> "brandRevenue", "l_suppkey" -> "topItems")
      .foreach { case (c, a) => assertField("lineitem", li, c, _ == LongType, "BIGINT", a) }
    assertField("lineitem", li, "l_linenumber",
      { case IntegerType | LongType => true; case _ => false }, "INT", "topItemsPerSupplier")
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").foreach(c =>
      assertField("lineitem", li, c, _ == DoubleType, "DOUBLE", "Relational money aggs"))
    Seq("l_returnflag", "l_linestatus").foreach(c =>
      assertField("lineitem", li, c, _ == StringType, "STRING", "Relational group keys"))
    // date columns: the queries compare with string literals and call
    // date_trunc/year/quarter — DATE or TIMESTAMP[_NTZ] both work
    val dateLike: DataType => Boolean =
      { case DateType | TimestampType | TimestampNTZType => true; case _ => false }
    assertField("lineitem", li, "l_shipdate", dateLike, "DATE/TIMESTAMP",
      "pricingSummary / shippingPriority filters")
    val ord = schemaOf("orders")
    assertField("orders", ord, "o_orderdate", dateLike, "DATE/TIMESTAMP",
      "monthlyRevenue / setOps filters")
    assertField("orders", ord, "o_orderkey", _ == LongType, "BIGINT", "joins")
    assertField("orders", ord, "o_custkey", _ == LongType, "BIGINT", "joins")
    assertField("orders", ord, "o_totalprice", _ == DoubleType, "DOUBLE", "money aggs")
    val cust = schemaOf("customer")
    assertField("customer", cust, "c_custkey", _ == LongType, "BIGINT", "joins")
    assertField("customer", cust, "c_mktsegment", _ == StringType, "STRING", "shippingPriority")
    val part = schemaOf("part")
    assertField("part", part, "p_partkey", _ == LongType, "BIGINT", "brandRevenue join")
    assertField("part", part, "p_type", _ == StringType, "STRING", "brandRevenue LIKE")
    val sup = schemaOf("supplier")
    assertField("supplier", sup, "s_suppkey", _ == LongType, "BIGINT", "revenueByNation")
    val nat = schemaOf("nation")
    assertField("nation", nat, "n_nationkey",
      { case IntegerType | LongType => true; case _ => false }, "INT", "revenueByNation")
    val reg = schemaOf("region")
    assertField("region", reg, "r_regionkey",
      { case IntegerType | LongType => true; case _ => false }, "INT", "revenueByNation")
  }
}
