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

  def remoteHeight(s: SparkSession, d: String): DataFrame =
    s.conf.getOption(RemoteHeightKey) match {
      case Some(v) =>
        s.range(1).select(lit(v.toLong).as("remote_height"))
      case None =>
        Tables.orders(s, d).agg(max(col("o_orderkey")).as("remote_height"))
    }
}
