package graft

import org.apache.spark.sql.functions._

/** The composed build: every stage's contract holds END TO END — the
  * system test that the registered operators actually fit together. */
class TrainingPipelineSpec extends SparkSpec {

  private lazy val out =
    java.nio.file.Files.createTempDirectory("graft_tp").toString
  private lazy val report = TrainingPipeline.run(spark, sf, out)

  test("stage funnel is monotone and splits partition the kept set") {
    assert(report.nSurvivors <= report.nDocs)
    assert(report.nQuality <= report.nSurvivors)
    assert(report.nTrain + report.nVal + report.nTest === report.nQuality)
    assert(report.nTrain > 0L)
    assert(report.nTrainBins > 0L)
  }

  test("kept docs are exactly px5's gated output; clusters never straddle splits") {
    val splits = TrainingPipeline.splitDocs(spark, sf)
    val px5 = q("px5_canonical_prep").select("doc_id")
    assert(splits.select("doc_id").exceptAll(px5).isEmpty)
    assert(px5.exceptAll(splits.select("doc_id")).isEmpty)
    val straddle = splits.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(straddle.count() === 0L)
  }

  test("shards read back as exactly the split sets, zone maps in place") {
    report // force the run
    val splits = TrainingPipeline.splitDocs(spark, sf)
    Seq("train", "val", "test").foreach { sp =>
      val expect = splits.filter(col("split") === sp).select("doc_id")
      if (expect.isEmpty) ()
      else {
        val back = spark.read.parquet(s"$out/$sp").select("doc_id")
        assert(back.exceptAll(expect).isEmpty && expect.exceptAll(back).isEmpty, sp)
        assert(spark.read.parquet(s"$out/$sp/_zonemap").count() >= 1L, sp)
      }
    }
  }

  test("dataset card fields agree with direct recomputation") {
    import org.json4s._
    val card = JsonMethods_parse(TrainingPipeline.datasetCard(spark, sf))
    def jint(v: JValue): Long = v.asInstanceOf[JInt].num.toLong
    val docs = Tables.documents(spark, sf)
    assert(jint(card \ "n_docs") === docs.count())
    // lang mix sums back to the doc count; every lang present
    val mix = (card \ "lang_mix").asInstanceOf[JObject].obj
    assert(mix.map(kv => jint(kv._2)).sum === docs.count())
    assert(mix.map(_._1).toSet ===
      docs.select("lang").distinct().collect().map(_.getString(0)).toSet)
    // duplication rates: near-dup removes at least as much as exact-dup
    assert(jint(card \ "near_dup_bp") >= jint(card \ "exact_dup_bp"))
    // quality buckets partition the corpus
    val qb = (card \ "quality_quartiles").asInstanceOf[JObject].obj
    assert(qb.map(kv => jint(kv._2)).sum === docs.count())
  }

  private def JsonMethods_parse(s: String) =
    org.json4s.jackson.JsonMethods.parse(s)

  test("train packing tiles the per-source stream with no gaps") {
    val splits = TrainingPipeline.splitDocs(spark, sf)
    val src = Tables.documents(spark, sf).select("doc_id", "source")
    val packed = functions.TextQueries.packed(
      splits.filter(col("split") === "train").join(src, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val gaps = packed.withColumn("prev_end",
        lag(col("start_offset") + col("n_tokens"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_offset") =!= col("prev_end"))
    assert(gaps.count() === 0L)
  }
}
