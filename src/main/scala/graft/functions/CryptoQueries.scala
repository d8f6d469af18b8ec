package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the crypto scalar layer (F1–F5) on testdata. These are
  * the non-SQL-expressible operators (DuckDB has no SHA-512/256, RIPEMD-160
  * or base58/c32) — per the driver contract they register WITHOUT oracle SQL
  * and get a rows-only check; value-level correctness is pinned by public
  * test vectors in CryptoSpec.
  *
  * Scalar UDFs are the right tool here (SURVEY §2.11): cold-path,
  * short-string digests; a codegen Expression would buy nothing measurable.
  */
object CryptoQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Digest via the native codegen expression (expressions.Sha512_256) —
    * no UDF row conversion; hex packing/unpacking stays in Spark-native
    * unhex/hex. (History: a string-in/string-out UDF with per-byte
    * String.format cost 31s at sf0.1; bytes-UDF 7s; native expression
    * removes the remaining UDF plumbing.) */
  private val btcAddr = udf { (pubkey: Array[Byte]) => Crypto.btcAddress(pubkey) }
  private val stxAddr = udf { (pubkey: Array[Byte]) => Crypto.stxAddress(pubkey) }

  /** The digest chain is nullable only because unhex CAN return null on
    * malformed hex — it never does here (inputs are md5 hex). Left
    * nullable, the inner join's inferred isnotnull(key) filter re-evaluates
    * the ENTIRE digest chain as a pre-join predicate, and constraint
    * propagation pushes it below the tx-side aggregate onto the raw scan:
    * 600k + 150k redundant SHA-512/256 evals at sf0.1, ~4x the useful
    * digest work (measured: f1 4.5 s with, 1.3 s without). coalesce with a
    * non-null literal makes the key non-nullable, so Catalyst folds the
    * isnotnull away; values are unchanged (the digest is never null).
    *
    * The join key is the RAW 32-byte digest, not its 64-char lowercase hex:
    * the digest never reaches f1's output (o_orderkey, n_txs only), so
    * hex+lower over every row existed purely to manufacture a join key
    * twice as wide — at the sf100 rehearsal that's 300 M string builds and
    * double the shuffle/hash-relation bytes on the suite's widest join.
    * Binary equality is exactly hex-string equality here (hex is
    * injective). */
  private def blockId(blockHash: org.apache.spark.sql.Column,
                      consensusHash: org.apache.spark.sql.Column) =
    coalesce(call_function("graft_sha512_256",
      concat(unhex(blockHash), unhex(consensusHash))), lit(Array.empty[Byte]))

  /** The digest-keyed tx-count relation over an EXPLICIT lineitem frame:
    * aggregate-before-join — collapse the tx side to one row per key
    * BEFORE digesting, since the count is key-associative; this digests
    * 1/4 of the rows and shuffles longs instead of digests. A rewrite
    * Catalyst cannot do itself (the digest is opaque to it). */
  private[graft] def txCountsOf(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_txs"))
      .select(
        blockId(md5(col("l_orderkey").cast("string")),
          md5(concat(lit("c"), col("l_orderkey").cast("string")))).as("stacks_block_id"),
        col("n_txs"))

  /** The tx-count relation as a MEMOIZED merge-family index (VERDICT r10
    * item 8): at sf100 f1 re-ran the 600 M-row aggregation + digest under
    * whatever page-cache state the previous query left, measuring
    * 43–120 s run-to-run; materializing the 147 M-row index once makes
    * the query the join it claims to be, and the build is what a
    * production pipeline PERSISTS — counts are additive per digest, so
    * the stored relation admits an ingest delta by per-key sum
    * ([[mergeTxCounts]], identity law in CryptoSpec) instead of a
    * rescan. */
  private[graft] def txCountIndex(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.ensure(s)
    graft.Memo.cached(s, d, "txcount_idx", "lineitem.parquet")(
      txCountsOf(Tables.lineitem(s, d)))
  }

  /** Admit a lineitem delta into a stored tx-count index: aggregate the
    * DELTA only, union, per-digest sum. Counts are additive, so this is
    * exactly recompute-over-the-union even when an order key straddles
    * the stored/delta boundary. */
  private[graft] def mergeTxCounts(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(txCountsOf(delta))
      .groupBy(col("stacks_block_id"))
      .agg(sum(col("n_txs")).as("n_txs"))

  /** F1/J9 — the reference's real computed-key join: stacks_block_id =
    * SHA-512/256(block_hash ‖ consensus_hash) (rpc.js:320-336), block side
    * derived from orders, tx side from lineitem, joined on the digest. */
  private val f1: Q = (s, d) => {
    graft.GraftExtensions.ensure(s)
    val blocks = Tables.orders(s, d).select(
      col("o_orderkey"),
      blockId(md5(col("o_orderkey").cast("string")),
        md5(concat(lit("c"), col("o_orderkey").cast("string")))).as("stacks_block_id"))
    val txCounts = txCountIndex(s, d)
    // broadcast the block side when it is dimension-sized: ~12 MB of
    // 64-char digests at sf0.1 sits just over the 10 MB auto-broadcast
    // threshold, so Spark would pick a sort-merge join — two full sorts
    // on 64-char strings that dwarf the digest cost itself (measured:
    // components 0.7 s, SMJ join 2.5 s). At cluster scale the block side
    // is the per-burnchain-block dimension (orders of magnitude smaller
    // than the tx fact side) — broadcast is the shape that survives 100×.
    // GUARDED by an actual row count (one parquet-metadata action): the
    // sf10 rehearsal force-broadcast 15 M digests (~1.4 GB hash relation
    // — 37 s, 20× sf1, the round-9 filed residual). Above the cap the
    // join falls to shuffle_hash — hash join without the SMJ sorts, no
    // gigabyte broadcast build.
    val blockRows = orderRows(s, d)
    val joined =
      if (blockRows <= BroadcastRowCap)
        broadcast(blocks).join(txCounts, "stacks_block_id")
      else blocks.hint("shuffle_hash").join(txCounts, "stacks_block_id")
    joined
      .select(col("o_orderkey"), col("n_txs"))
      .orderBy(col("o_orderkey"))
  }

  /** Broadcast guard for [[f1]]: 4 M digest rows ≈ a few hundred MB of
    * hash relation — the upper edge of what an executor should host.
    * Every oracle-gate scale (≤150 k) and sf1 (1.5 M) broadcast; sf10
    * (15 M) shuffles. */
  private val BroadcastRowCap = 4000000L

  /** orders row count memoized per (dir, mtime) — the guard must not run
    * a fresh Spark count job on every plan CONSTRUCTION (Bench warmup +
    * timed run, Verify, plan-shape specs; review r9). Same contract as
    * Similarity.corpusN. */
  private val orderRowsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()
  private def orderRows(s: SparkSession, d: String): Long = {
    // lastModified = 0 for a missing path would cache under fingerprint 0
    // and then serve that count forever once the file appears — fail loud
    // instead (the join needs the table anyway) (ADVICE r9)
    val f = new java.io.File(s"$d/orders.parquet")
    require(f.exists, s"orders.parquet missing under $d")
    // routed through timedBuild so the one parquet-metadata count Bench
    // triggers lands in its own builds line item instead of inside
    // whichever f1-family query plans first (ADVICE r9)
    orderRowsCache.computeIfAbsent((d, f.lastModified),
      _ => graft.Memo.timedBuild("orders_rowcount")(Tables.orders(s, d).count()))
      .longValue
  }

  /** F2–F4 — address book: a deterministic compressed-pubkey per supplier
    * (02 ‖ SHA-256(name)), hashed to both BTC base58check and Stacks
    * c32check mainnet addresses (rpc.js:358-362, 437). */
  private val f2: Q = (s, d) => {
    val pub = unhex(concat(lit("02"), sha2(col("s_name"), 256)))
    Tables.supplier(s, d)
      .select(
        col("s_suppkey"),
        btcAddr(pub).as("btc_address"),
        stxAddr(pub).as("stx_address"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, Q] = Map(
    "f1_block_id_join" -> f1,
    "f2_address_book" -> f2
  )

  /** Intentionally empty: none of these digests exist in DuckDB — the
    * driver records rows-only checks; CryptoSpec pins exact values. */
  val oracles: Map[String, String] = Map.empty
}
