package graft

import graft.sources.Enrichment
import org.apache.spark.sql.functions._

/** The S13–S15 enrichment seam: defaults reproduce the reference constants,
  * and alternate values (conf- or file-provided) actually route into f10's
  * economics (VERDICT r2 item 5). */
class EnrichmentSpec extends SparkSpec {

  private def clearConfs(): Unit =
    Seq(Enrichment.PathKey, Enrichment.StxMilliKey,
      Enrichment.BtcScaleKey, Enrichment.GasSatsKey)
      .foreach(spark.conf.unset)

  test("default seam is the recorded reference constants") {
    clearConfs()
    val r = Enrichment.prices(spark).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1500L, 6L, 35000L)))
  }

  test("conf-provided prices flow into f10's rr exactly") {
    clearConfs()
    try {
      spark.conf.set(Enrichment.StxMilliKey, "3000")
      val got = q("f10_rr_miner_info")
        .select("stx_address", "actual_win", "actual_win_bonus",
          "total_mined", "miner_burned", "rr_milli")
        .collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        val (win, bonus) = (r.getLong(1), r.getLong(2))
        val (mined, burned) = (r.getLong(3), r.getLong(4))
        // independent BigInt model of the seam-parameterized economics
        val earnMilli = BigInt(bonus) * 2466 * 3000 +
          BigInt(win - bonus) * 1000 * 3000
        val cost = (BigInt(mined) * 35000 + burned) * 6
        val n = (earnMilli * 10 - cost) * 2000 + cost
        val d = cost * 2
        val q0 = n / d
        val expect = (if (n % d != 0 && (n < 0) != (d < 0)) q0 - 1 else q0).toLong
        assert(r.getLong(5) === expect, s"address=${r.getString(0)}")
      }
    } finally clearConfs()
  }

  test("an empty enrichment file falls back to the default ROW, never empty") {
    clearConfs()
    val dir = java.nio.file.Files.createTempDirectory("enrich_empty").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "prices.json"), "")
    try {
      spark.conf.set(Enrichment.PathKey, s"$dir/prices.json")
      val rows = Enrichment.prices(spark).collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 1500L)
    } finally clearConfs()
  }

  test("peer-probe seam: injected remote height flips can_mine") {
    val key = graft.sources.PeerProbe.RemoteHeightKey
    try {
      spark.conf.unset(key)
      val base = q("j11_stage_compare").head()
      val local = base.getLong(0)
      // the default path equals the derived remote table (oracle-gated)
      spark.conf.set(key, local.toString)
      assert(q("j11_stage_compare").head().getBoolean(2))
      spark.conf.set(key, (local + 5).toString)
      val probed = q("j11_stage_compare").head()
      assert(probed.getLong(1) === local + 5)
      assert(!probed.getBoolean(2))
    } finally spark.conf.unset(key)
  }

  test("file-backed seam overrides, missing fields fall back") {
    clearConfs()
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "prices.json"),
      """{"stx_price_milli": 2000}""")
    try {
      spark.conf.set(Enrichment.PathKey, s"$dir/prices.json")
      val r = Enrichment.prices(spark).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2000L, 6L, 35000L)))
    } finally clearConfs()
  }
}
