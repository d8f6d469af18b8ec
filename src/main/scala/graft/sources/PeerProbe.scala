package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S16–S17 — the reference's peer-RPC probe (rpc.js:549-575 polls the
  * burnchain node's tip; server.js:233-242 compares it against the local
  * stage): like [[Enrichment]], the FETCH is a deployment concern routed
  * through a config seam, while the compare semantics live in the engine.
  *
  * Unset, the seam falls back to the derived remote table (the same
  * in-repo derivation j11 gates against DuckDB), so the default is
  * deterministic and oracle-checkable; a deployment sets
  * `spark.graft.probe.remote_height` (or writes the enrichment file) from
  * its poller and every probe consumer picks it up with no plan change —
  * a 1-row broadcast relation either way. */
object PeerProbe {

  val RemoteHeightKey = "spark.graft.probe.remote_height"
  val InfoPathKey = "spark.graft.probe.blockchaininfo_path"

  def remoteHeight(s: SparkSession, d: String): DataFrame =
    s.conf.getOption(RemoteHeightKey) match {
      case Some(v) =>
        s.range(1).select(lit(v.toLong).as("remote_height"))
      case None =>
        Tables.orders(s, d).agg(max(col("o_orderkey")).as("remote_height"))
    }

  private val infoSchemaDdl =
    "chain STRING, blocks LONG, headers LONG, bestblockhash STRING, " +
      "difficulty DOUBLE, mediantime LONG"

  /** S16 — the `GET /blockchaininfo` document relay (rpc.js:558-580 fetches
    * the burnchain node's getblockchaininfo; server.js:246-249 returns it
    * verbatim). The FETCH is a deployment concern: a poller writes the
    * node's JSON where `spark.graft.probe.blockchaininfo_path` points and
    * the seam relays its fields verbatim as a 1-row broadcastable relation.
    * Unset, the document is DERIVED deterministically from the snapshots
    * table (blocks/headers = the same remote-height derivation j11 gates,
    * mediantime = the tip's burnchain timestamp, bestblockhash = a
    * deterministic digest of the tip height), so the zero-egress default is
    * oracle-checkable like the rest of the probe seam. */
  def blockchainInfo(s: SparkSession, d: String): DataFrame = {
    // derived default: blocks/headers = the same remote-height derivation
    // j11 gates, mediantime = the shared chain-tip timestamp (Domain.chainTip)
    val derived = remoteHeight(s, d)
      .crossJoin(broadcast(
        graft.Domain.chainTip(s, d).select(col("tip_ts").as("mediantime"))))
      .select(
        lit("main").as("chain"),
        col("remote_height").as("blocks"),
        col("remote_height").as("headers"),
        md5(concat(lit("block:"), col("remote_height"))).as("bestblockhash"),
        lit(0.0).as("difficulty"),
        col("mediantime"))
    s.conf.getOption(InfoPathKey) match {
      case Some(path) =>
        // a poller that crashed mid-write leaves an empty file: union the
        // derived row behind the file row so the relation is one row by
        // construction, never empty (same contract as Enrichment.prices)
        s.read.schema(infoSchemaDdl).json(path).limit(1)
          .withColumn("src", lit(0))
          .unionByName(derived.withColumn("src", lit(1)))
          .orderBy(col("src")).limit(1).drop("src")
      case None => derived
    }
  }
}
