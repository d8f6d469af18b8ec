package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator (SURVEY.md §2 inventory);
  * `oracleSql` carries the equivalent DuckDB SQL for the hash-compare gate.
  * Modules: RelationalCore (scans/filters/joins), Aggregations, Windows,
  * ScalarQueries (F-layer + event windows); more land per milestone.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A8 per-height rollup — the reference's handleBlockCommitInfo
    * (rpc.js:463-487) — over the sf0.001 commits table. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregations.queries("a8_block_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalCore.queries ++
      operators.JoinStrategies.queries ++
      operators.Aggregations.queries ++
      operators.Windows.queries ++
      functions.ScalarQueries.queries ++
      functions.TextQueries.queries ++
      functions.Retrieval.queries ++
      functions.CryptoQueries.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Profiling.queries ++
      plans.ForkWalk.queries ++
      plans.PageRank.queries

  /** Dir-aware oracle set: the static map plus the entries that EMBED
    * data-derived literals — the trained k-means codebook the embedding
    * family (d5/d7/x6/x3b) blocks on cannot be a static string, so those
    * oracles are generated against the actual data dir at Verify dump
    * time. Training is deterministic per (dir, data) and the centroids
    * round-trip exactly as SQL literals, so the hash gate stays exact. */
  def oracleSqlFor(spark: SparkSession, sfDir: String,
                   only: Option[Set[String]] = None): Map[String, String] = {
    // generate a module's dynamic oracles only when the (optional) subset
    // actually asks for one of its keys — generation trains the codebook,
    // which a dev-loop subset run of unrelated queries must not pay for
    // (review r9)
    def wanted(keys: Set[String]) = only.forall(o => o.exists(keys.contains))
    oracleSql ++
      (if (wanted(operators.Dedup.dynamicOracleKeys))
        operators.Dedup.dynamicOracles(spark, sfDir) else Map.empty) ++
      (if (wanted(operators.Similarity.dynamicOracleKeys))
        operators.Similarity.dynamicOracles(spark, sfDir) else Map.empty)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops and for
    * the dir-dependent entries [[oracleSqlFor]] adds. */
  def oracleSql: Map[String, String] =
    operators.RelationalCore.oracles ++
      operators.JoinStrategies.oracles ++
      operators.Aggregations.oracles ++
      operators.Windows.oracles ++
      functions.ScalarQueries.oracles ++
      functions.TextQueries.oracles ++
      functions.Retrieval.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.Profiling.oracles ++
      plans.ForkWalk.oracles ++
      plans.PageRank.oracles
}
