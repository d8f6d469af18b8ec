package graft

import org.apache.spark.sql.functions._

/** Native DotProduct expression: value parity with the HOF formulation,
  * codegen path, and type checking. */
class DotProductSpec extends SparkSpec {
  test("graft_dot equals the zip_with/aggregate fold bit-for-bit") {
    GraftExtensions.ensure(spark)
    val df = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("native", call_function("graft_dot", col("v"), col("v")))
      .withColumn("hof",
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("graft_dot resolves in SQL through the session extension") {
    GraftExtensions.ensure(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))").head()
    assert(r.getDouble(0) === 32.0)
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftExtensions.ensure(spark)
    // input must itself be codegen-friendly: a higher-order function (e.g.
    // transform) in the same stage disables WSCG for the whole stage
    val plan = spark.sql(
      "SELECT graft_dot(array(cast(id AS double), 2.0d), array(3.0d, 4.0d)) FROM range(10)")
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"))
  }

  test("graft_dot rejects non-double-array inputs at analysis time") {
    GraftExtensions.ensure(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot('abc', array(1.0d))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("graft_isect equals size(array_intersect) on random sorted long sets") {
    GraftExtensions.ensure(spark)
    // deterministic pseudo-random sets: two hash families over ranges of
    // varying length, distinct'd and sorted — the producer's exact shape
    val df = spark.range(2000)
      .select(col("id"),
        sort_array(array_distinct(transform(
          sequence(lit(0), (col("id") % 37) + 3),
          i => pmod(hash(col("id") * 31 + i), lit(50)).cast("long")))).as("a"),
        sort_array(array_distinct(transform(
          sequence(lit(0), (col("id") % 29) + 3),
          i => pmod(hash(col("id") * 17 + i * 7), lit(50)).cast("long")))).as("b"))
      .withColumn("native", call_function("graft_isect", col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0L)
  }

  test("graft_isect edge cases: empty, disjoint, identical, subset") {
    GraftExtensions.ensure(spark)
    val rows = spark.sql(
      """SELECT
        |  graft_isect(cast(array() AS array<bigint>), array(1L, 2L)) AS empty,
        |  graft_isect(array(1L, 3L), array(2L, 4L)) AS disjoint,
        |  graft_isect(array(1L, 2L, 3L), array(1L, 2L, 3L)) AS identical,
        |  graft_isect(array(2L, 3L), array(1L, 2L, 3L, 9L)) AS subset""".stripMargin)
      .head()
    assert(rows.getLong(0) === 0L && rows.getLong(1) === 0L &&
      rows.getLong(2) === 3L && rows.getLong(3) === 2L)
  }

  test("graft_isect skips null elements (never reads a null slot as 0)") {
    GraftExtensions.ensure(spark)
    // nulls sort FIRST in array_sort; two null-leading arrays must not
    // spuriously match on the 0-read of a null slot (ADVICE r8), and the
    // non-null tail still counts — both interpreted and codegen paths
    val sql =
      """SELECT
        |  graft_isect(array(CAST(NULL AS BIGINT), 2L, 5L),
        |              array(CAST(NULL AS BIGINT), 3L, 5L)) AS tail_match,
        |  graft_isect(array(CAST(NULL AS BIGINT)), array(CAST(NULL AS BIGINT))) AS all_null""".stripMargin
    val rows = spark.sql(sql).head()
    assert(rows.getLong(0) === 1L && rows.getLong(1) === 0L)
    // same answers off the codegen path (literal folding may constant-fold
    // the above; force per-row eval through a column)
    val df = spark.range(3).select(
      call_function("graft_isect",
        array(lit(null).cast("bigint"), col("id"), lit(9L)),
        array(lit(null).cast("bigint"), lit(9L))).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L))
  }

  test("graft_isect participates in whole-stage codegen") {
    GraftExtensions.ensure(spark)
    val plan = spark.sql(
      "SELECT graft_isect(array(id, 5L), array(5L, 9L)) FROM range(10)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_isect"))
  }

  test("graft_isect rejects non-long-array inputs at analysis time") {
    GraftExtensions.ensure(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_isect(array(1.0d), array(1L))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_isect") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
