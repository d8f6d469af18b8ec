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
}
