package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL ingestion for the documents pipeline — the wire format most
  * training-data dumps arrive in (one JSON object per line), landed into
  * the same `documents` shape the dedup/text/corpus-prep layers consume.
  *
  * Scale rules this reader enforces:
  *   - SCHEMA IS PINNED. Schema inference reads the whole corpus once
  *     before the real job starts — at 100 TB that is a full extra scan.
  *     The expected shape is declared; extra fields in the input are
  *     simply never read (column pruning at the JSON parser level).
  *   - CORRUPT LINES ARE DATA, not exceptions. PERMISSIVE mode routes
  *     unparseable lines into a corrupt-record column; the pipeline
  *     quarantines and counts them instead of dying mid-ingest on byte
  *     one trillion. FAILFAST is for unit tests, not 100 TB dumps.
  *   - The reader is a plain `spark.read.json` line source: splittable by
  *     Hadoop line boundaries, so a 100 TB directory parallelizes by
  *     input split with no coordination.
  *
  * The reference ingests via SQLite files it opens read-only
  * (rpc.js:39-57); JSONL is the equivalent landing edge for the
  * document corpus this engine adds.
  */
object JsonlIngest {

  /** Expected JSONL shape. `_corrupt` is the PERMISSIVE-mode capture
    * column (must be part of the declared schema to be populated). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Read a JSONL file/dir/glob into documents-shaped rows plus a
    * `corrupt` flag. n_chars is derived (the upstream dump doesn't carry
    * it); a line that parses but lacks `text` is corrupt=false with null
    * text — the quality filters downstream handle those. */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        col("_corrupt").isNotNull.as("corrupt"))

  /** The clean split: rows that parsed, documents-schema-exact (what the
    * rest of the pipeline consumes). */
  def clean(s: SparkSession, path: String): DataFrame =
    read(s, path).filter(!col("corrupt"))
      .select("doc_id", "text", "lang", "source", "n_chars")

  /** The quarantine split: raw offending lines, preserved verbatim for
    * inspection/repair — never silently dropped. Reads the file as TEXT
    * and parses with from_json: Spark refuses raw-file queries whose only
    * referenced column is the internal corrupt-record capture, and the
    * text route also keeps the byte-exact line (the JSON parser's capture
    * normalizes whitespace). Blank lines aren't records on either path. */
  def quarantine(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("j", from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .filter(col("j._corrupt").isNotNull)
      .select(col("value").as("raw_line"))

  /** SCHEMA-EVOLVED parquet read: a long-lived landing directory
    * accumulates files written under different schema versions (columns
    * added over time), and a plain read takes ONE footer's schema —
    * whichever file is sampled — silently dropping the newer columns.
    * `mergeSchema` unions every file's schema instead: old files surface
    * the added columns as nulls, new files keep them, and downstream
    * code declares defaults once with coalesce. The footer-merge job
    * scales with FILE COUNT, not bytes (it reads metadata only) —
    * affordable where the alternative, rewriting 100 TB to the new
    * schema, is not. Columns may be ADDED, never retyped: a type change
    * is a different table, and this read fails loudly on one. */
  def readEvolved(s: SparkSession, dir: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(dir)

  /** SCHEMA DRIFT report between two dataset versions: one row per column
    * that was added, removed, or retyped from `oldDir` to `newDir` — the
    * contract check an ingest pipeline runs BEFORE pointing readers at a
    * new drop (readEvolved makes additions safe to read; a retype is a
    * different table and must be caught loudly, not at job-failure depth
    * inside a consumer). Metadata-only: reads two footers' schemas, never
    * data. Empty result = fully compatible. */
  def schemaDiff(s: SparkSession, oldDir: String, newDir: String): DataFrame = {
    import s.implicits._
    def fields(dir: String): Map[String, String] =
      s.read.parquet(dir).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
    val (o, n) = (fields(oldDir), fields(newDir))
    val rows =
      (n.keySet -- o.keySet).toSeq.sorted.map(c => (c, "added", null: String, n(c))) ++
        (o.keySet -- n.keySet).toSeq.sorted.map(c => (c, "removed", o(c), null: String)) ++
        (o.keySet & n.keySet).toSeq.sorted.collect {
          case c if o(c) != n(c) => (c, "retyped", o(c), n(c))
        }
    rows.toDF("column_name", "change", "old_type", "new_type")
  }
}
