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

  /** The profiled percentiles (discrete, type-1: smallest value whose
    * cumulative count reaches ⌈p·n⌉ — integer-exact on both engines;
    * interpolating forms differ in the last ulp between engines). */
  private val Percentiles = Seq(50, 90, 99)

  /** PR2 — document-length percentiles via a LENGTH HISTOGRAM: one scan
    * aggregates to (#distinct lengths) rows, the cumulative runs over that
    * aggregated histogram (bounded — the allowed post-agg window shape),
    * and each percentile is the min length whose cumulative count clears
    * its rank. The histogram form IS the 100 TB percentile plan: distinct
    * lengths ≪ rows, and no sort ever sees the corpus. */
  private val pr2: Q = (s, d) => {
    val hist = Tables.documents(s, d)
      .select(length(col("text")).cast("long").as("len"))
      // NULL text would order NULLS FIRST on Spark but LAST on DuckDB,
      // shifting every cumulative count — percentiles are over non-null
      // lengths by definition on both sides
      .filter(col("len").isNotNull)
      .groupBy(col("len")).agg(count(lit(1)).as("cnt"))
    val cumW = org.apache.spark.sql.expressions.Window.orderBy(col("len"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val total = hist.agg(sum(col("cnt")).as("n"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(cumW))
      .crossJoin(broadcast(total))
    val rows = Percentiles.map { p =>
      cum.filter(col("cum") * 100L >= col("n") * p)
        .agg(min(col("len")).as("len_value"))
        .select(lit(p.toLong).as("percentile"), col("len_value"))
    }
    rows.reduce(_.unionByName(_)).orderBy(col("percentile"))
  }

  /** PR3 — GROUPING-SETS profile: doc counts and char volume at every
    * (source × lang) rollup level in ONE pass. Grouping sets are the
    * standard OLAP cube primitive; Spark plans the rollup as a single
    * Expand + hash Aggregate — one shuffle with map-side partials, never a
    * re-scan per level (k separate GROUP BYs would read the corpus k
    * times). The gid is computed as grouping(source)·2 + grouping(lang) on
    * BOTH engines rather than relying on each engine's grouping_id bit
    * convention. */
  private val pr3: Q = (s, d) =>
    Tables.documents(s, d)
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        (grouping(col("source")).cast("long") * 2 +
          grouping(col("lang")).cast("long")).as("gid"))
      .select(coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang"), lit("(all)")).as("lang"),
        col("n_docs"), col("chars"), col("gid"))
      .orderBy(col("gid"), col("source"), col("lang"))

  /** Heavy-hitter columns: one high-cardinality key (the skew question a
    * 100 TB pipeline asks before choosing salts) and one categorical. */
  private val HhCols = Seq("l_suppkey", "l_returnflag")
  private val HhK = 10

  /** PR4 — HEAVY HITTERS: exact top-10 most frequent values per profiled
    * column, in one unpivoted scan: explode each row to (column, value)
    * pairs, ONE count shuffle grouped by (column, value) with map-side
    * partials, then rank over the AGGREGATED counts frame (the allowed
    * post-agg window shape, same class as pr2's histogram cumulative —
    * the window never sees fact rows). This is the pre-salting skew probe:
    * it tells you which keys need a15's salted aggregation before the big
    * job runs. */
  private val pr4: Q = (s, d) => {
    val pairs = Tables.lineitem(s, d).select(
      explode(array(HhCols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*))
        .as("p"))
      .select(col("p.column_name"), col("p.value"))
    val counts = pairs.groupBy(col("column_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    // null ordering pinned explicitly: Spark defaults ASC NULLS FIRST,
    // DuckDB ASC NULLS LAST — a NULL value tying on cnt would rank
    // differently across engines otherwise (self-review r5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column_name"))
      .orderBy(col("cnt").desc, col("value").asc_nulls_last)
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HhK)
      .orderBy(col("column_name"), col("rnk"))
  }

  /** PR5 — OUTLIER DAYS by an EXACT z-test: flag days whose event count
    * sits more than 2 standard deviations from the daily mean, with zero
    * floating point. |x − μ| > z·σ is squared and multiplied through by
    * n², which cancels: (n·x − Σx)² > z²·(n·Σx² − (Σx)²) — every factor
    * an integer, so both engines agree on the boundary exactly (a double
    * stddev would flip borderline days between engines). Products ride
    * DECIMAL(38,0)/HUGEINT so daily counts up to ~10¹² can't overflow.
    * Scale shape: one agg to daily grain, a 3-value broadcast, a row-local
    * predicate — the monitoring probe that decides whether an ingest day
    * needs quarantining before it poisons a training mix. */
  private val pr5: Q = (s, d) => {
    val dec = "decimal(38,0)"
    val daily = Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("n_events")).cast(dec).as("sx"),
      sum(col("n_events").cast(dec) * col("n_events")).as("sx2"))
    daily.crossJoin(broadcast(stats))
      .withColumn("dev", col("n") * col("n_events") - col("sx"))
      .select(col("day"), col("n_events"),
        (col("dev") * col("dev") >
          lit(4) * (col("n") * col("sx2") - col("sx") * col("sx")))
          .as("is_outlier"))
      .orderBy(col("day"))
  }

  val queries: Map[String, Q] = Map(
    "pr1_profile" -> pr1, "pr2_length_percentiles" -> pr2,
    "pr3_rollup_profile" -> pr3, "pr4_heavy_hitters" -> pr4,
    "pr5_outlier_days" -> pr5)

  val oracles: Map[String, String] = Map(
    "pr5_outlier_days" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        |   FROM events GROUP BY 1),
        | st AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |   CAST(sum(n_events) AS HUGEINT) AS sx,
        |   sum(CAST(n_events AS HUGEINT) * n_events) AS sx2 FROM daily)
        | SELECT day, n_events,
        |   (n * n_events - sx) * (n * n_events - sx)
        |     > 4 * (n * sx2 - sx * sx) AS is_outlier
        | FROM daily, st ORDER BY day""".stripMargin,
    "pr4_heavy_hitters" -> {
      val pairs = HhCols.map(c =>
        s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS value FROM lineitem")
        .mkString(" UNION ALL ")
      s"""WITH p AS ($pairs),
         | c AS (SELECT column_name, value, count(*) AS cnt FROM p GROUP BY 1, 2),
         | r AS (SELECT *, CAST(row_number() OVER (PARTITION BY column_name
         |   ORDER BY cnt DESC, value ASC NULLS LAST) AS BIGINT) AS rnk FROM c)
         | SELECT column_name, value, cnt, rnk FROM r WHERE rnk <= $HhK
         | ORDER BY column_name, rnk""".stripMargin
    },
    "pr3_rollup_profile" ->
      """SELECT coalesce(source, '(all)') AS source, coalesce(lang, '(all)') AS lang,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid
        | FROM documents GROUP BY ROLLUP (source, lang)
        | ORDER BY gid, source, lang""".stripMargin,
    "pr1_profile" -> cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
         | FROM lineitem""".stripMargin
    }.mkString("", " UNION ALL ", " ORDER BY column_name"),
    "pr2_length_percentiles" -> {
      val one = (p: Int) =>
        s"""SELECT CAST($p AS BIGINT) AS percentile, min(len) AS len_value
           | FROM c WHERE cum * 100 >= n * $p""".stripMargin
      s"""WITH h AS (SELECT CAST(len(text) AS BIGINT) AS len, count(*) AS cnt
         |   FROM documents WHERE text IS NOT NULL GROUP BY 1),
         | t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
         | c AS (SELECT len, CAST(sum(cnt) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, n FROM h, t)
         | ${Percentiles.map(one).mkString(" UNION ALL ")}
         | ORDER BY percentile""".stripMargin
    }
  )
}
