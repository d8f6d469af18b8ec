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

  test("mm2 body features: parser-located body equals the planted payload") {
    // the planted body is unhex(md5(text)); the parser must land its body
    // offset exactly on it, so the features match direct md5 arithmetic
    val feats = Multimodal.bodyFeatures(
      Multimodal.mediaWithHeaders(spark, sf)).filter(_.doc_id == 0L).collect()
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map(_ & 0xFF)
    for (f <- feats) { // doc 0 may be webp (then quarantined, zero rows)
      assert(f.body_bytes === 16)
      assert(f.mean_byte === bytes.sum.toDouble / 16)
      assert(f.max_byte === bytes.max)
    }
  }

  test("mm2 admits exactly the rows the real parser decodes") {
    val decoded = q("mm5_header_decode").filter(col("err").isNull)
    val mm2 = q("mm2_body_features")
    assert(mm2.count() === decoded.count())
    assert(mm2.join(decoded, Seq("doc_id"), "left_anti").count() === 0L)
    assert(mm2.filter(col("format") === "webp").count() === 0L)
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

  test("mm5 decode inverts the encoder: parsed dims equal planted metadata") {
    val meta = q("mm1_media_metadata")
      .select(col("doc_id"), col("width").as("mw"), col("height").as("mh"))
    val dec = q("mm5_header_decode").filter(col("err").isNull)
    // every png/jpg row decodes cleanly and matches the planted dims
    val joined = dec.join(meta, Seq("doc_id")) // mm1 filters width>64; inner join scopes to those
    assert(joined.filter(col("width") =!= col("mw") ||
      col("height") =!= col("mh") || col("bit_depth") =!= 8).count() === 0L)
    // quarantine rows are exactly the webp container rows
    val qr = q("mm5_header_decode").filter(col("err").isNotNull)
    assert(qr.filter(col("format") =!= "webp").count() === 0L)
    assert(qr.filter(col("width").isNotNull || col("height").isNotNull).count() === 0L)
  }

  test("mm5 malformed headers quarantine instead of throwing") {
    val s = spark
    import s.implicits._
    def png(tail: Array[Byte]): Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++ tail
    val cases: Seq[(Long, Array[Byte])] = Seq(
      1L -> Array[Byte](1, 2, 3),                         // unknown magic
      2L -> png(Array[Byte](0, 0, 0, 13)),                // truncated before IHDR body
      3L -> png(Array[Byte](0, 0, 0, 12) ++ "IHDR".getBytes ++ new Array[Byte](17)), // bad length
      4L -> (Array(0xFF, 0xD8, 0xFF, 0xDA).map(_.toByte) ++ new Array[Byte](8)), // SOS before SOF
      5L -> Array(0xFF, 0xD8, 0xFF, 0xE0, 0x40, 0x00).map(_.toByte), // segment overruns payload
      6L -> Array(0xFF, 0xD8, 0x00, 0x00).map(_.toByte),  // non-marker byte mid-stream
      7L -> png(Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++ new Array[Byte](17)) // zero dims
    )
    val out = operators.Multimodal.decodeHeaders(
      cases.toDF("doc_id", "media")).collect()
    assert(out.length === cases.length)
    assert(out.forall(r => !r.isNullAt(5)), "every malformed row must carry err")
    assert(out.forall(r => r.isNullAt(2) && r.isNullAt(3)), "no dims on malformed rows")
  }

  test("mm5 parser walks segments: SOF behind extra JPEG segments still found") {
    // SOI + COM segment + DQT-like filler + SOF2 (progressive) + body
    val com = Array(0xFF, 0xFE, 0x00, 0x06).map(_.toByte) ++ "test".getBytes
    val sof2 = Array(0xFF, 0xC2, 0x00, 0x11, 0x0C).map(_.toByte) ++ // precision 12
      Array[Byte](0x01, 0x00, 0x03, 0x02) ++ // h=256, w=770
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val bytes = Array(0xFF, 0xD8).map(_.toByte) ++ com ++ sof2
    val r = operators.Multimodal.decodeHeader(9L, bytes)
    assert(r.err.isEmpty)
    assert((r.format, r.width, r.height, r.bit_depth) ===
      ((Some("jpg"), Some(770), Some(256), Some(12))))
    // FF fill bytes before a marker are legal padding, not a segment
    val padded = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF).map(_.toByte) ++ com.drop(1) ++ sof2
    val r2 = operators.Multimodal.decodeHeader(10L, padded)
    assert(r2.err.isEmpty && r2.width === Some(770))
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

  test("pr10 decode health agrees with a direct recount of mm5's output") {
    val out = q("pr10_decode_health").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent recount off the decoder output itself
    val mm5 = q("mm5_header_decode").collect()
    val byFmt = mm5.groupBy(_.getString(1))
    assert(out.keySet === byFmt.keySet)
    byFmt.foreach { case (fmt, rows) =>
      val ok = rows.count(_.isNullAt(5)).toLong
      val bad = rows.length - ok
      assert(out(fmt)._1 === rows.length.toLong, s"$fmt n_media")
      assert(out(fmt)._2 === ok, s"$fmt n_decoded")
      assert(out(fmt)._3 === bad, s"$fmt n_quarantined")
    }
    // the planted corpus decodes png/jpg fully and quarantines all webp —
    // the health read must show exactly that
    assert(out("png")._4 === 0L && out("jpg")._4 === 0L)
    assert(out("webp")._4 === 10000L)
    // totals cover every media row
    assert(out.values.map(_._1).sum === Tables.documents(spark, sf).count())
  }
}
