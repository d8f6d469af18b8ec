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

  /** events.parquet stores ts as TIMESTAMP(NANOS). How that surfaces
    * depends on the Spark build: ≤4.0 rejects it unless
    * `spark.sql.legacy.parquet.nanosAsLong` maps it to a raw nanos Long;
    * 4.1.2 reads it natively as TIMESTAMP_NTZ (µs-truncated) and ignores
    * the legacy conf. Branch on the dtype the reader actually produced so
    * both paths yield the same µs-precision TIMESTAMP_NTZ wall-clock values
    * (the data is µs-exact; DuckDB reads the same file as TIMESTAMP_NS, so
    * oracle comparisons stay deterministic either way). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    // NB: conf.getOption returns the registered DEFAULT ("false"), so test
    // the effective value — older readers need this conf to read at all
    if (s.conf.get(k, "false") != "true") s.conf.set(k, "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long read: convert nanos → µs NTZ
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampType => // defensive: align to NTZ (session TZ is UTC)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
      case TimestampNTZType => raw // native NTZ read — already µs wall-clock
      case other => // fail AT THE TABLE in every entry point, not just in
        // TableSchemaSpec: a future reader change to an unhandled dtype
        // must name the source, not flow unconverted into Bench/Verify
        // (ADVICE r7)
        throw new IllegalStateException(
          s"events.ts read as unhandled dtype $other — update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
