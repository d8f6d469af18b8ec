package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The full dashboard document (VERDICT r2 item 2): every section of the
  * reference's packMiningMonitorData (mining_monitor_rpc.js:151-161) plus
  * the server's price/btc_total/btc_hash_power fields (server.js:268-275),
  * with the reference's field names. */
class DashboardSpec extends SparkSpec {

  private lazy val doc: JValue = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dash").toString
    Pipelines.refreshCache(spark, sf, dir)
    JsonMethods.parse(Pipelines.dashboard(spark, dir))
  }

  private def arr(v: JValue): List[JValue] =
    v match { case JArray(xs) => xs; case other => fail(s"not an array: $other") }

  test("document carries all five reference sections plus the server fields") {
    val keys = doc.asInstanceOf[JObject].obj.map(_._1)
    assert(keys === List("currentStatus", "minerTable", "burnFeeArea",
      "winnerPie", "rateOfReturn", "price", "btc_total", "btc_hash_power"))
  }

  test("currentStatus: tip height + 20-point series with averages") {
    val tip = (doc \ "currentStatus" \ "current_block" \ "stacks_block_height")
    val hi = Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.max("o_orderkey")).head().getLong(0)
    assert(tip === JInt(hi))
    Seq("current_burn_fee", "current_miner").foreach { sec =>
      val pts = arr(doc \ "currentStatus" \ sec \ "data_20")
      assert(pts.nonEmpty && pts.length <= 20)
      assert((doc \ "currentStatus" \ sec \ "avg") !== JNothing)
    }
  }

  test("minerTable: 50-row winner table + tail-20 per-commit fees") {
    val table = arr(doc \ "minerTable" \ "table")
    assert(table.nonEmpty && table.length <= 50)
    assert(table.forall(r => (r \ "stacks_block_height") != JNothing &&
      (r \ "leader_key_address") != JNothing && (r \ "burn_fee") != JNothing))
    val fees = arr(doc \ "minerTable" \ "minersBurnFee20")
    assert(fees.nonEmpty)
    assert(fees.forall(r => (r \ "height") != JNothing &&
      (r \ "address") != JNothing && (r \ "fee") != JNothing))
  }

  test("burnFeeArea: dense gap-filled series per emitted miner") {
    val pts = arr(doc \ "burnFeeArea" \ "data")
    assert(pts.nonEmpty)
    val byAddr = pts.groupBy(p => p \ "address")
    assert(byAddr.size <= 10) // serving bound
    // w5's grid is dense: every miner gets exactly the window's heights
    val sizes = byAddr.values.map(_.length).toSet
    assert(sizes.size === 1)
    assert(pts.forall(p => (p \ "burn_fee") != JNothing))
  }

  test("keyset pages walk the FULL area series; top-10 document is a strict subset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_area").toString
    Pipelines.refreshCache(spark, sf, dir)
    // page-walk the complete series with a deliberately awkward page size
    val walked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cursor: Option[(Long, Long)] = None
    var done = false
    var pages = 0
    while (!done) {
      val rows = Pipelines.burnFeeAreaPage(spark, dir, cursor, 997)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      walked ++= rows
      pages += 1
      assert(pages < 10000, "cursor did not advance")
      if (rows.length < 997) done = true
      else cursor = Some((rows.last._1, rows.last._2))
    }
    // exactly the cache relation: nothing lost, nothing duplicated
    val full = spark.read.parquet(s"$dir/burn_fee_area")
      .collect().map(r => (r.getAs[Long]("address"), r.getAs[Long]("height"),
        r.getAs[Long]("cum_filled")))
    assert(walked.length === full.length)
    assert(walked.toSet === full.toSet)
    assert(walked.toSeq === walked.sortBy(p => (p._1, p._2)).toSeq) // global order
    // the bounded dashboard's top-10 series is a subset of the walked set
    val docPts = arr(doc \ "burnFeeArea" \ "data").map(p =>
      ((p \ "address").asInstanceOf[JInt].num.toLong,
        (p \ "height").asInstanceOf[JInt].num.toLong,
        (p \ "burn_fee").asInstanceOf[JInt].num.toLong))
    assert(docPts.nonEmpty && docPts.toSet.subsetOf(walked.toSet))
    // and the JSON wrapper terminates with a null cursor
    val lastPage = Pipelines.burnFeeAreaPageJson(spark, dir,
      Some((walked.last._1, walked.last._2)), 997)
    assert(JsonMethods.parse(lastPage) \ "next" === JNull)
  }

  test("winnerPie and rateOfReturn carry the all/r1000/r100 triple") {
    Seq("winnerPie", "rateOfReturn").foreach { sec =>
      val keys = (doc \ sec).asInstanceOf[JObject].obj.map(_._1)
      assert(keys === List("all", "r1000", "r100"), sec)
    }
    val all = arr(doc \ "winnerPie" \ "all")
    assert(all.nonEmpty && all.length <= 10)
    assert(all.forall(r => (r \ "address") != JNothing &&
      (r \ "number") != JNothing && (r \ "RR") != JNothing))
    assert(arr(doc \ "rateOfReturn" \ "all").nonEmpty) // superseded stub
  }

  test("rateOfReturn values match the rr relation read by name (reorder-proof)") {
    import org.apache.spark.sql.functions.col
    // recompute the top rr row independently, selecting columns BY NAME —
    // if dashboard() read a swapped same-type column (the r3 nit), the
    // emitted RR would differ from this value
    val expect = functions.ScalarQueries.rrMinerInfo(None)(spark, sf)
      .select(col("stx_address"), col("rr_milli"))
      .orderBy(col("rr_milli").desc, col("stx_address")).limit(1).head()
    val first = arr(doc \ "rateOfReturn" \ "all").head
    assert((first \ "address") === JString(expect.getString(0)))
    assert((first \ "RR") === JInt(BigInt(expect.getLong(1))))
  }

  test("bitcoin_block timestamp derives from the burnchain tip, not a constant") {
    val ts = doc \ "currentStatus" \ "current_block" \ "bitcoin_block" \ "timestamp"
    val expect = Pipelines.chainTip(spark, sf)
      .select("tip_ts").head().getLong(0)
    assert(ts === JInt(BigInt(expect)))
  }

  test("price/btc_total/hash_power come from the enrichment seam + a9") {
    assert((doc \ "price" \ "btc") === JInt(60000))
    assert((doc \ "price" \ "stx") === JDouble(1.5))
    assert((doc \ "btc_total").isInstanceOf[JDouble] ||
      (doc \ "btc_total").isInstanceOf[JDecimal])
    assert((doc \ "btc_hash_power") === JString("0"))
  }
}
