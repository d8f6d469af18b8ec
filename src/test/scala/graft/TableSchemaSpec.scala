package graft

import org.apache.spark.sql.types._

/** Environment probe: asserts the POST-READ schema of every driver table.
  *
  * Round 6 lost 25 queries and 28 specs to a single silent environment
  * shift — the Spark image moved to 4.1.2, which reads the events `ts`
  * column as TIMESTAMP_NTZ instead of honoring the nanos-as-long legacy
  * conf, and the failure surfaced 28 suites downstream instead of at the
  * table (VERDICT r6 item 3 / next-round item 3). This spec pins the
  * contract at the source: if the Spark build or the driver's testdata
  * generator changes what a `Tables.*` reader produces, THIS fails first,
  * naming the table and column, before any operator spec runs.
  *
  * The expected types are the post-read dtypes under the current
  * environment (Spark 4.1.2 + TESTDATA.md parquet). `Tables.events`
  * normalizes its `ts` to TIMESTAMP_NTZ whatever the reader produced —
  * that normalization contract is asserted here too.
  */
class TableSchemaSpec extends SparkSpec {

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
                    expect: (String, DataType)*): Unit = {
    val got = fields(df)
    assert(got.keySet == expect.map(_._1).toSet,
      s"$name column set drifted: got ${got.keySet.toSeq.sorted}")
    expect.foreach { case (c, t) =>
      assert(got(c) == t, s"$name.$c: expected $t, read ${got(c)} — the " +
        "Spark image or testdata generator changed; fix Tables." + name)
    }
  }

  test("region post-read schema") {
    check("region", Tables.region(spark, sf),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("nation post-read schema") {
    check("nation", Tables.nation(spark, sf),
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
  }

  test("customer post-read schema") {
    check("customer", Tables.customer(spark, sf),
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
  }

  test("supplier post-read schema") {
    check("supplier", Tables.supplier(spark, sf),
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  }

  test("part post-read schema") {
    check("part", Tables.part(spark, sf),
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("orders post-read schema (o_orderdate stays NTZ wall-clock)") {
    check("orders", Tables.orders(spark, sf),
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
  }

  test("lineitem post-read schema (l_shipdate stays NTZ wall-clock)") {
    check("lineitem", Tables.lineitem(spark, sf),
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  test("events post-read schema: ts normalized to TIMESTAMP_NTZ (the r6 hazard)") {
    check("events", Tables.events(spark, sf),
      "event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    // The normalization must also yield sane wall-clock values, not just
    // the right dtype (a wrong nanos/micros scale factor would pass the
    // dtype check but put timestamps thousands of years off).
    import org.apache.spark.sql.functions._
    val yr = Tables.events(spark, sf)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts wall-clock out of range: years ${yr.getInt(0)}..${yr.getInt(1)}")
  }

  test("documents post-read schema") {
    check("documents", Tables.documents(spark, sf),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("documents.source honors the srcN naming contract px24 parses") {
    // px24's repeat factor is 1 + TRY_CAST(substring(source, 4) AS INT) %
    // 4 — a source name off this contract would NULL in both engines and
    // silently drop the doc from the upsampled stream. Assert the contract
    // at the table so a testdata format drift fails loudly here (ADVICE r7).
    import org.apache.spark.sql.functions._
    val off = Tables.documents(spark, sf)
      .filter(!col("source").rlike("^src[0-9]+$")).count()
    assert(off === 0L, s"$off documents.source values violate the srcN contract")
  }

  test("embeddings post-read schema (vector element type drives every ANN kernel)") {
    check("embeddings", Tables.embeddings(spark, sf),
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  }
}
