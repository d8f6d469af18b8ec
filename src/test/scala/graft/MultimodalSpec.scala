package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing invariants + pinned stub-decode arithmetic. */
class MultimodalSpec extends SparkSpec {
  test("mm1 metadata: formats from the fixed set, dims in [1, 256]") {
    val df = q("mm1_media_metadata")
    assert(df.filter(!col("format").isInCollection(Seq("png", "jpg", "webp"))).count() === 0L)
    assert(df.filter(col("width") < 1 || col("width") > 256 ||
      col("height") < 1 || col("height") > 256).count() === 0L)
    assert(df.filter(col("size_bytes") =!= 16).count() === 0L)
  }

  test("mm2 stub decode: features match direct byte arithmetic") {
    val f = Multimodal.decodeFeatures(spark, sf).filter(_.doc_id == 0L).head()
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map(_ & 0xFF)
    assert(f.size_bytes === 16)
    assert(f.mean_byte === bytes.sum.toDouble / 16)
    assert(f.max_byte === bytes.max)
  }

  test("mm2 runs partition-batched over every document") {
    assert(q("mm2_decode_features").count() ===
      Tables.documents(spark, sf).count())
  }

  test("mm3 frame sampling is the exact per-video arithmetic progression") {
    val df = q("mm3_frame_sample")
    // every sampled index is on the fps grid and in range
    assert(df.filter(col("frame_idx") % col("fps") =!= 0 ||
      col("frame_idx") < 0 || col("frame_idx") >= col("n_frames")).count() === 0L)
    // per-video count = ceil(n_frames / fps), one row per video
    val per = df.groupBy("doc_id", "n_frames", "fps")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(per.filter(col("n") =!=
      org.apache.spark.sql.functions.expr("(n_frames + fps - 1) div fps")).count() === 0L)
    assert(per.count() === Tables.documents(spark, sf).count())
  }

  test("mm4 resize plan: long side pinned to 224, aspect preserved within rounding") {
    val df = q("mm4_resize_plan")
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.filter(greatest(col("out_w"), col("out_h")) =!= 224L).count() === 0L)
    assert(df.filter(col("out_w") < 1L || col("out_h") < 1L).count() === 0L)
    // half-up rounding of the short side: |out_short·long − short·224| ≤ long/2
    val bad = df.withColumn("err", abs(
      when(col("width") >= col("height"),
        col("out_h") * col("width") - col("height") * 224L)
        .otherwise(col("out_w") * col("height") - col("width") * 224L)))
      .filter(col("err") * 2L > greatest(col("width"), col("height")).cast("long"))
    assert(bad.count() === 0L)
  }
}
