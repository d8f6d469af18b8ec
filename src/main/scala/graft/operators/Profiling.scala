package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling (north-star hygiene op): per-column null counts, distinct
  * cardinalities and min/max over the fact table — the pre-ingestion
  * validation pass every large pipeline runs before training. ONE scan
  * computes every column's stats (a single wide aggregate), then the result
  * is unpivoted to rows; at 100 TB this matters because k separate
  * per-column jobs would re-read the table k times.
  *
  * Column set excludes doubles on purpose: float-to-string rendering
  * differs across engines and the gate compares strings; numeric profiling
  * of doubles would go through rounded stats instead.
  */
object Profiling {
  type Q = (SparkSession, String) => DataFrame

  private val cols =
    Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag",
      "l_linestatus", "l_shipdate")

  private val pr1: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        (col("n_rows") - col(s"${c}_nn")).as("n_nulls"),
        col(s"${c}_nd").as("n_distinct"),
        col(s"${c}_min").as("min_value"),
        col(s"${c}_max").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_value"), col("p.max_value"))
      .orderBy(col("column_name"))
  }

  val queries: Map[String, Q] = Map("pr1_profile" -> pr1)

  val oracles: Map[String, String] = Map(
    "pr1_profile" -> cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
         | FROM lineitem""".stripMargin
    }.mkString("", " UNION ALL ", " ORDER BY column_name")
  )
}
