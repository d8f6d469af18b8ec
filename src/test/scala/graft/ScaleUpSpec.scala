package graft

import org.apache.spark.sql.functions._

/** Laws for the scale-rehearsal generator (ScaleUp, VERDICT r7 item 3).
  *
  * The sf1 bench record (BENCH_SF1.json) is only evidence if the scaled
  * input is a FAITHFUL magnification of the driver data — same density,
  * original rows intact, no cross-copy key collisions. Checked at factor 3
  * on sf0.001 (laws are factor-independent).
  */
class ScaleUpSpec extends SparkSpec {
  private val F = 3

  test("copy 0 is the identity: original rows survive verbatim") {
    val orig = Tables.lineitem(spark, sf)
    val scaled = ScaleUp.scaleLineitem(orig, F,
      ScaleUp.orderOff(Tables.orders(spark, sf), orig))
    // the slice of the scaled table inside the original key range IS the
    // original (except-both-ways = set equality; lineitem has no dup rows
    // within a key, and any diff would surface in either direction)
    val slice = scaled.filter(col("l_orderkey") <= orig.agg(max("l_orderkey")).head.getLong(0))
    assert(slice.exceptAll(orig).isEmpty && orig.exceptAll(slice).isEmpty)
  }

  test("row counts multiply by F; key spaces are disjoint per copy") {
    val orders = Tables.orders(spark, sf)
    val scaled = ScaleUp.scaleOrders(orders, F,
      ScaleUp.orderOff(orders, Tables.lineitem(spark, sf)))
    assert(scaled.count() == F * orders.count())
    // disjoint: every key distinct-counts F times the original distincts
    assert(scaled.select(countDistinct("o_orderkey")).head.getLong(0) ==
      F * orders.select(countDistinct("o_orderkey")).head.getLong(0))
  }

  test("orders and lineitem share the same offset: FK fan-out preserved") {
    val off = ScaleUp.orderOff(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val o = ScaleUp.scaleOrders(Tables.orders(spark, sf), F, off)
    val l = ScaleUp.scaleLineitem(Tables.lineitem(spark, sf), F, off)
    // every scaled lineitem still matches exactly one scaled order, and the
    // total join cardinality is F x the original join (no cross-copy match)
    val origJoin = Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count()
    assert(l.join(o, col("l_orderkey") === col("o_orderkey")).count() == F * origJoin)
  }

  test("documents: copies are near-dups (suffix token), n_chars consistent") {
    val d = ScaleUp.scaleDocuments(Tables.documents(spark, sf), F)
    assert(d.filter(length(col("text")) =!= col("n_chars")).isEmpty)
    // all F copies of a doc share the original text as a prefix → shingle
    // overlap stays high (the cross-copy near-dup stress is real)
    val docOff = ScaleUp.keyOff(Seq(Tables.documents(spark, sf)), Seq("doc_id"))
    val orig = Tables.documents(spark, sf).select(col("doc_id"), col("text").as("t0"))
    val joined = d.withColumn("base_id", col("doc_id") % lit(docOff))
      .join(orig.withColumnRenamed("doc_id", "base_id"), "base_id")
    assert(joined.filter(!col("text").startsWith(col("t0"))).isEmpty)
  }

  test("zipf mode: hot keys dominate, row counts and PK disjointness intact") {
    val li = Tables.lineitem(spark, sf)
    val off = ScaleUp.orderOff(Tables.orders(spark, sf), li)
    val sk = ScaleUp.scaleLineitemSkewed(li, F, off)
    // row count law survives skew; PK (orderkey) disjointness survives skew
    assert(sk.count() == F * li.count())
    assert(sk.select(countDistinct("l_orderkey")).head.getLong(0) ==
      F * li.select(countDistinct("l_orderkey")).head.getLong(0))
    // the 5 hot suppliers hold a dominant share (~70% by construction;
    // assert a robust >= 50%)
    val hot = sk.filter(col("l_suppkey").between(1, 5)).count()
    assert(hot * 2 >= sk.count(), s"hot share ${hot.toDouble / sk.count()}")
    // dtype unchanged (union/readers must not see a widened column)
    assert(sk.schema("l_suppkey").dataType === li.schema("l_suppkey").dataType)
    // hot keys remain valid FK values into supplier
    val supMax = Tables.supplier(spark, sf).agg(max("s_suppkey")).head.getLong(0)
    assert(supMax >= 5)
  }

  test("embeddings: perturbation is tiny and only on component 0") {
    val e = ScaleUp.scaleEmbeddings(Tables.embeddings(spark, sf), F)
    val vecOff = ScaleUp.keyOff(Seq(Tables.embeddings(spark, sf)), Seq("vec_id"))
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("base_id"), col("embedding").as("e0"))
    val joined = e.withColumn("base_id", col("vec_id") % lit(vecOff))
      .join(orig, "base_id")
    // tail components identical; component 0 within F*1e-3 of the original
    assert(joined.filter(
      slice(col("embedding"), 2, 1000000) =!= slice(col("e0"), 2, 1000000)).isEmpty)
    assert(joined.filter(
      abs(element_at(col("embedding"), 1) - element_at(col("e0"), 1)) > F * 1e-3 + 1e-6).isEmpty)
  }
}
