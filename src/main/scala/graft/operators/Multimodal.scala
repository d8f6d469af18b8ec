package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star ops): media as opaque BINARY plus typed
  * metadata, with decode/feature-extraction as a partition-batched stub.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC FAKE (byte arithmetic over the payload);
  * everything around it — binary column, metadata struct, partition-batched
  * processing shape, output schema — is the real plumbing a decode UDF
  * would plug into. At 100 TB media bytes stay opaque through the plan
  * (no decode before the filter), metadata predicates prune first, and the
  * per-partition iterator processes rows in batches exactly like an
  * mapInPandas/Arrow decode stage would.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Extracted features of one media payload (what a real decoder emits). */
  case class MediaFeature(doc_id: Long, format: String, size_bytes: Int,
                          mean_byte: Double, max_byte: Int)

  /** Synthetic media table: payload = md5 bytes of the text (stands in for
    * real image bytes); metadata derived from hex digits with instr() so
    * DuckDB mirrors it exactly. */
  private[operators] def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(
        col("doc_id"),
        unhex(col("h")).as("media"),
        expr("CASE (instr('0123456789abcdef', substring(h, 1, 1)) - 1) % 3 " +
          "WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END").as("format"),
        expr("1 + 16 * (instr('0123456789abcdef', substring(h, 1, 1)) - 1) + " +
          "(instr('0123456789abcdef', substring(h, 2, 1)) - 1)").cast("int").as("width"),
        expr("1 + 16 * (instr('0123456789abcdef', substring(h, 3, 1)) - 1) + " +
          "(instr('0123456789abcdef', substring(h, 4, 1)) - 1)").cast("int").as("height"))

  /** MM1 — metadata projection over the binary column: media stays opaque,
    * predicates/projections run on typed metadata only. Oracle-gated. */
  private val mm1: Q = (s, d) =>
    media(s, d)
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        length(col("media")).as("size_bytes"))
      .filter(col("width") > 64)
      .orderBy(col("doc_id"))

  /** MM2 — partition-batched "decode": the stub feature extractor runs once
    * per partition over an iterator of rows — the exact batch shape a real
    * Arrow/Pandas decode stage has. Rows-only check (the decoder is the
    * stub); MultimodalSpec pins the arithmetic. */
  def decodeFeatures(s: SparkSession, d: String): Dataset[MediaFeature] = {
    import s.implicits._
    media(s, d)
      .select(col("doc_id"), col("format"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // STUB decode: a real implementation would hand `batch` to a codec
        // library in chunks; this fake derives features from the raw bytes
        // deterministically so tests can pin values.
        batch.map { case (id, fmt, bytes) =>
          val unsigned = bytes.map(_ & 0xFF)
          MediaFeature(id, fmt, bytes.length,
            unsigned.sum.toDouble / unsigned.length, unsigned.max)
        }
      }
  }

  private val mm2: Q = (s, d) =>
    decodeFeatures(s, d).toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy(col("doc_id"))

  /** Synthetic video table: the same opaque payload with frame-count/fps
    * metadata derived from hex digits (n_frames 1..256, fps 1..16). */
  private[operators] def videos(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(
        col("doc_id"), col("h"),
        expr("1 + 16 * (instr('0123456789abcdef', substring(h, 5, 1)) - 1) + " +
          "(instr('0123456789abcdef', substring(h, 6, 1)) - 1)").cast("int").as("n_frames"),
        expr("1 + (instr('0123456789abcdef', substring(h, 7, 1)) - 1)")
          .cast("int").as("fps"))

  /** MM3 — FRAME SAMPLING: one frame per second (every fps-th index) as a
    * metadata-only expansion — sequence() + explode computes the sampled
    * (video, frame_idx) set ROW-LOCALLY with the payload untouched, which
    * is the 100 TB shape: sampling decides WHAT to decode before any byte
    * of video is read, and the sampled set then drives an mm2-style
    * partition-batched decode (frame_fp stands in for the fetched frame).
    * Oracle-gated — the sample is pure metadata arithmetic. */
  private val mm3: Q = (s, d) =>
    videos(s, d)
      .select(col("doc_id"), col("h"), col("n_frames"), col("fps"),
        explode(sequence(lit(0), col("n_frames") - 1, col("fps"))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("fps"), col("frame_idx"),
        md5(concat(col("h"), lit(":"), col("frame_idx").cast("string"))).as("frame_fp"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val FitBox = 224L

  /** MM4 — RESIZE PLANNING: aspect-preserving fit of every image into a
    * 224×224 box as EXACT integer arithmetic (long side → 224, short side
    * → half-up of short·224/long via the shared ExactRatio, so both
    * engines round identically). Like mm3 this is the metadata half of the
    * operation — the plan computes every target geometry row-locally
    * without touching a payload byte; the pixel work is the mm2-style
    * batched stub's job. Oracle-gated. */
  private val mm4: Q = (s, d) => {
    val landscape = col("width") >= col("height")
    val short224 = (lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column) =>
      graft.functions.ExactRatio.scaled(lo.cast("long") * FitBox, hi.cast("long"), 1L)
    media(s, d)
      .select(col("doc_id"), col("width"), col("height"),
        when(landscape, lit(FitBox))
          .otherwise(short224(col("width"), col("height"))).as("out_w"),
        when(landscape, short224(col("height"), col("width")))
          .otherwise(lit(FitBox)).as("out_h"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "mm1_media_metadata" -> mm1,
    "mm2_decode_features" -> mm2,
    "mm3_frame_sample" -> mm3,
    "mm4_resize_plan" -> mm4
  )

  private def dig(pos: Int) = s"(instr('0123456789abcdef', substring(h, $pos, 1)) - 1)"

  val oracles: Map[String, String] = Map(
    "mm1_media_metadata" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
         | SELECT doc_id,
         |   CASE ${dig(1)} % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS format,
         |   CAST(1 + 16 * ${dig(1)} + ${dig(2)} AS INTEGER) AS width,
         |   CAST(1 + 16 * ${dig(3)} + ${dig(4)} AS INTEGER) AS height,
         |   octet_length(from_hex(h)) AS size_bytes
         | FROM m WHERE 1 + 16 * ${dig(1)} + ${dig(2)} > 64 ORDER BY doc_id""".stripMargin,
    // mm2 intentionally has no oracle: the decode stage is a stub.
    "mm3_frame_sample" ->
      s"""WITH v AS (SELECT doc_id, h,
         |     CAST(1 + 16 * ${dig(5)} + ${dig(6)} AS INTEGER) AS n_frames,
         |     CAST(1 + ${dig(7)} AS INTEGER) AS fps
         |   FROM (SELECT doc_id, md5(text) AS h FROM documents))
         | SELECT doc_id, n_frames, fps, f.frame_idx,
         |   md5(h || ':' || CAST(f.frame_idx AS VARCHAR)) AS frame_fp
         | FROM v, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, fps)) AS frame_idx) f
         | ORDER BY doc_id, frame_idx""".stripMargin,
    "mm4_resize_plan" ->
      s"""WITH m AS (SELECT doc_id,
         |     CAST(1 + 16 * ${dig(1)} + ${dig(2)} AS INTEGER) AS width,
         |     CAST(1 + 16 * ${dig(3)} + ${dig(4)} AS INTEGER) AS height
         |   FROM (SELECT doc_id, md5(text) AS h FROM documents))
         | SELECT doc_id, width, height,
         |   CASE WHEN width >= height THEN 224
         |        ELSE ${graft.functions.ExactRatio.scaledSql("width * 224", "height", 1L)} END AS out_w,
         |   CASE WHEN width >= height THEN ${graft.functions.ExactRatio.scaledSql("height * 224", "width", 1L)}
         |        ELSE 224 END AS out_h
         | FROM m ORDER BY doc_id""".stripMargin
  )
}
