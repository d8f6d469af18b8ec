package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END TRAINING-DATA PIPELINE: the engine's stages composed the
  * way a real pretraining data build runs them — proving the pieces FIT,
  * not just exist. Stage by stage:
  *
  *   1. NEAR-DUP DEDUP — d6 cluster labels (MinHash-LSH candidates →
  *      connected components); only canonical survivors continue.
  *   2. QUALITY + LANGUAGE GATE — px5's prep: labeled English with
  *      quality ≥ 0.55, over the canonical survivors.
  *   3. LEAKAGE-SAFE SPLIT at CLUSTER grain — px10's groupSplit keyed by
  *      cluster_id, so even a near-dup PARAPHRASE of a train doc can
  *      never land in val/test.
  *   4. SEQUENCE PACKING of the train split — px11's per-source
  *      fixed-token-budget bins.
  *   5. SHARD WRITE — each split clustered by doc_id (disjoint per-file
  *      key ranges) plus a zone-map manifest for planner-side pruning.
  *
  * Every stage is the registered operator's own core (d6 / prep / split /
  * pack / clustered write) — this object only wires them, so the pipeline
  * can never drift from the gated definitions. Shuffle inventory of the
  * whole build: the d6 rounds (edge-grain), one quality-join, the pack
  * window (per-source), and the write's range partitioning — nothing
  * quadratic, nothing driver-bound; the run report carries per-stage
  * counts (aggregates, not collects of data rows). */
object TrainingPipeline {

  case class Report(nDocs: Long, nSurvivors: Long, nQuality: Long,
                    nTrain: Long, nVal: Long, nTest: Long,
                    nTrainBins: Long, trainShardFiles: Int)

  /** Kept docs (post dedup+quality) with their split assignment — the
    * relation stages 4–5 consume; exposed for the spec's stage checks. */
  def splitDocs(s: SparkSession, sfDir: String): DataFrame = {
    val clusters = operators.Dedup.queries("d6_neardup_clusters")(s, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    val kept = functions.TextQueries.queries("px5_canonical_prep")(s, sfDir)
    functions.TextQueries.groupSplit(
      kept.join(clusters, Seq("doc_id")), col("cluster_id"))
  }

  def run(s: SparkSession, sfDir: String, outDir: String): Report = {
    val docs = Tables.documents(s, sfDir)
    val splits = splitDocs(s, sfDir).localCheckpoint(true)
    // stage 4: pack ONLY the train split (val/test serve whole docs)
    val src = docs.select(col("doc_id"), col("source"))
    val packedTrain = functions.TextQueries.packed(
      splits.filter(col("split") === "train")
        .join(src, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens")))
    // stage 5: shard per split, doc_id-clustered, with a zone map
    val bySplit = splits.select(col("doc_id"), col("split")).join(src, Seq("doc_id"))
    var trainFiles = 0
    Seq("train", "val", "test").foreach { sp =>
      val part = bySplit.filter(col("split") === sp).drop("split")
      if (!part.isEmpty) {
        val n = Pipelines.writeClustered(part, "doc_id", 4, s"$outDir/$sp")
        Pipelines.buildZoneMap(s, s"$outDir/$sp", "doc_id")
        if (sp == "train") trainFiles = n
      }
    }
    def cnt(c: org.apache.spark.sql.Column): Long =
      splits.filter(c).count()
    Report(
      nDocs = docs.count(),
      nSurvivors = operators.Dedup.queries("d6_neardup_clusters")(s, sfDir)
        .filter(col("is_canonical")).count(),
      nQuality = splits.count(),
      nTrain = cnt(col("split") === "train"),
      nVal = cnt(col("split") === "val"),
      nTest = cnt(col("split") === "test"),
      nTrainBins = packedTrain.select(col("source"), col("bin_idx")).distinct().count(),
      trainShardFiles = trainFiles)
  }

  /** DATASET CARD — the datasheet a curated corpus ships with, assembled
    * from the engine's own gated statistics: sizes, language/source
    * mixes, duplication rate, quality distribution. Every collect is
    * bounded by category cardinality (langs, sources), never rows; the
    * heavy numbers are single aggregates. The serving-edge JSON shape
    * follows [[Pipelines.dashboard]]'s conventions (Locale.ROOT,
    * select-by-name before positional reads). */
  def datasetCard(s: SparkSession, sfDir: String): String = {
    val docs = Tables.documents(s, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        size(functions.TextOps.toks(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val tot = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens")).head()
    val (nDocs, nTokens) = (tot.getLong(0), tot.getLong(1))
    def mix(key: String): String =
      docs.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col(key))
        .collect().map(r => s""""${r.getString(0)}":${r.getLong(1)}""")
        .mkString("{", ",", "}")
    val survivors = operators.Dedup.queries("d1_exact_dedup")(s, sfDir).count()
    val nearSurvivors = operators.Dedup.queries("d6_neardup_clusters")(s, sfDir)
      .filter(col("is_canonical")).count()
    // exact half-up basis points, driver-side (two scalars)
    def rateBp(kept: Long): Long =
      java.math.BigDecimal.valueOf(nDocs - kept)
        .multiply(java.math.BigDecimal.valueOf(10000))
        .divide(java.math.BigDecimal.valueOf(nDocs), 0,
          java.math.RoundingMode.HALF_UP).longValueExact()
    val qualityBuckets = functions.TextQueries.queries("tx2_quality_score")(s, sfDir)
      .groupBy((col("quality_bp") / 2500L).cast("long").as("b"))
      .agg(count(lit(1)).as("n")).collect()
      .sortBy(_.getLong(0))
      .map(r => s""""q${r.getLong(0) * 25}_${r.getLong(0) * 25 + 25}":${r.getLong(1)}""")
      .mkString("{", ",", "}")
    s"""{"n_docs":$nDocs,"n_tokens":$nTokens,""" +
      s""""lang_mix":${mix("lang")},"source_mix":${mix("source")},""" +
      s""""exact_dup_bp":${rateBp(survivors)},""" +
      s""""near_dup_bp":${rateBp(nearSurvivors)},""" +
      s""""quality_quartiles":$qualityBuckets}"""
  }

  /** Dev driver: run the whole build against a testdata dir. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_train").toString)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      "graft-training-pipeline")
    println(run(spark, sfDir, outDir))
    spark.stop()
  }
}
