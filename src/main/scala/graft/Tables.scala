package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver test data (TESTDATA.md).
  *
  * Schema is carried by Parquet itself (self-describing); Catalyst prunes
  * columns and pushes predicates into these scans, so every query should
  * start from one of these and stay declarative. At 100 TB the same readers
  * work unchanged — `spark.read.parquet` scales by file splits.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")

  /** events.parquet stores ts as TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long (legacy conf — Sessions.local sets
    * it at construction; the idempotent guard below covers harness-owned
    * sessions, same pattern as GraftExtensions.ensure) and convert to a
    * microsecond TIMESTAMP_NTZ (the data is µs-exact; DuckDB sees the same
    * wall-clock values, keeping oracle comparisons deterministic). */
  def events(s: SparkSession, d: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    // NB: conf.getOption returns the registered DEFAULT ("false"), so test
    // the effective value — the table is unreadable without this conf
    if (s.conf.get(k, "false") != "true") s.conf.set(k, "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
