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
  /** Scan fan-out decision cache: (path, cores, minRows, mode, max mtime) →
    * target partition count (None = leave the scan alone). Driver-side
    * footer metadata only — never row data. */
  private val fanoutCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, Int, Long, String, Long), Option[Int]]()

  /** Parquet's minimum split is one ROW GROUP, and the driver testdata ships
    * each table as a single file with a single row group — so every scan
    * stage (decode + all pre-exchange work: tokenize, JSON parse, partial
    * aggregation) runs on ONE core regardless of `local[N]` (measured: f7
    * at sf0.1 is ~3.4 s warm, of which ~3 s is the single-task scan stage).
    * The guide's remedy for an unsplittable input (§2.5) is to repartition
    * immediately after the read. This is SCALE-ADAPTIVE, not a local tune:
    * the fan-out engages only when the source has fewer row groups than the
    * session has cores AND enough rows to matter — at production layouts
    * (many files / ≥128 MB row groups) the condition is simply false and
    * the reader is unchanged. Filters and column pruning still push through
    * the round-robin exchange to the scan (PushedFilters/ReadSchema are
    * unaffected), so the exchange ships only surviving rows of needed
    * columns. Config: `spark.graft.scan.fanout` = auto (default) | off;
    * `spark.graft.scan.fanoutMinRows` (default 1024) keeps tiny dimension
    * tables (broadcast-bound, no per-row work worth sharding) unfanned. */
  private def fanoutFor(s: SparkSession, path: String): Option[Int] = {
    val mode = s.conf.get("spark.graft.scan.fanout", "auto")
    if (mode == "off") return None
    val cores = s.sparkContext.defaultParallelism
    val minRows = s.conf.get("spark.graft.scan.fanoutMinRows", "1024").toLong
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val leaves =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
       else Seq(fs.getFileStatus(p)))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val mtime = if (leaves.isEmpty) 0L else leaves.map(_.getModificationTime).max
    fanoutCache.computeIfAbsent((path, cores, minRows, mode, mtime), _ => {
      // many files already split across cores — nothing to fix, and no
      // footer reads for wide production layouts
      if (leaves.size >= cores || leaves.isEmpty) None
      else {
        var groups = 0L
        var rows = 0L
        leaves.foreach { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, s.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = r.getFooter.getBlocks
            groups += blocks.size()
            blocks.forEach(b => rows += b.getRowCount)
          } finally r.close()
        }
        if (groups >= cores || rows < minRows) None else Some(cores)
      }
    })
  }

  /** `fan = true` readers opt into the fan-out; the full-suite A/B (r13)
    * measured a BLANKET fan-out as a net loss: queries whose first
    * operation is a selective aggregation previously shuffled only their
    * map-side partials, and the round-robin exchange made them ship the
    * whole raw table (+0.5–1.3 s each across the lineitem/orders/events
    * families), while the heavy-per-row consumers (tokenize, JSON parse,
    * md5 chain derivation) gained 2–4×. So the fan-out is opt-in where the
    * per-row work before the first exchange dominates: the documents and
    * embeddings tables always (every consumer tokenizes / runs vector
    * math), and named lineitem/orders call sites (f7's JSON dispatch,
    * f12's per-row md5+csv, the linkTable md5 chain). */
  private def t(spark: SparkSession, dir: String, name: String,
                fan: Boolean = false): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (!fan) df
    else fanoutFor(spark, s"$dir/$name.parquet") match {
      case Some(n) => df.repartition(n)
      case None => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")

  /** Fanned variant for the named call sites whose per-row work before
    * the first exchange dominates (see [[t]]; currently f7's JSON
    * dispatch — f12/j9/linkTable were A/B'd and measured worse fanned). */
  def lineitemFanned(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem", fan = true)

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
  def documents(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents", fan = true)
  def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings", fan = true)
}
