package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1 — canonical-fork selection (rpc.js:92-125, 277-318) and P2 — the
  * chain-linkage filter (rpc.js:156-175): the reference's two
  * parent-pointer-dependent operators.
  *
  * The fork tree is derived deterministically from `orders`: a main chain
  * (one block per orderkey, parent = previous key's hash) plus 3-block side
  * branches rooted at every 97th height — so the walk has real forks to
  * reject. Both engines derive the identical table (md5-keyed), and DuckDB
  * oracles the walk with WITH RECURSIVE.
  *
  * Scale design: the walk is POINTER DOUBLING — the reached set S and the
  * 2^k-ancestor jump table both double each round, so a depth-D chain needs
  * O(log D) self-joins instead of D sequential probes (rpc.js walks
  * one-by-one; that shape can never distribute). Each round is
  * localCheckpoint'ed: lineage stays constant-depth, and the loop stops at
  * fixpoint. The walk range is bounded by the reference's own
  * startblock/endblock parameterization (rpc.js:285-288).
  */
object ForkWalk {
  type Q = (SparkSession, String) => DataFrame

  /** Trailing-window size for the walk (P4 range semantics, rpc.js:13-21).
    * 1000 keeps the DuckDB recursive oracle O(depth·n) tractable — the
    * Spark side's doubling walk is O(n log depth) and doesn't care. */
  private val WalkWindow = 1000L

  private def h(prefix: String, k: org.apache.spark.sql.Column) =
    md5(concat(lit(prefix), k.cast("string")))

  /** Derived block tree: main chain + 3-block side branches every 97th key,
    * restricted to the trailing [tip-window+1, tip] height range. `window`
    * carries the reference's startblock/endblock parameterization
    * (rpc.js:285-288) as a real argument. */
  private[plans] def chainTable(s: SparkSession, d: String,
                                window: Long = WalkWindow): DataFrame = {
    val o = Tables.orders(s, d)
    val hi = o.agg(max(col("o_orderkey")).as("hi"))
    val keys = o.select(col("o_orderkey").as("k"))
      .crossJoin(broadcast(hi))
      .filter(col("k") > col("hi") - window)
    val main = keys.select(
      h("m", col("k")).as("block_hash"),
      h("m", col("k") - 1).as("parent_hash"),
      col("k").as("height"))
    val branch = keys.filter(col("k") % 97 === 0)
      .select(col("k"), explode(sequence(lit(1), lit(3))).as("i"))
      .select(
        md5(concat(lit("b"), col("k").cast("string"), lit(":"),
          col("i").cast("string"))).as("block_hash"),
        when(col("i") === 1, h("m", col("k") - 1))
          .otherwise(md5(concat(lit("b"), col("k").cast("string"), lit(":"),
            (col("i") - 1).cast("string")))).as("parent_hash"),
        (col("k") - 1 + col("i")).as("height"))
    main.unionByName(branch)
  }

  /** Canonical chain of `blocks` (block_hash, parent_hash, height): all
    * ancestors of the deepest tip (ties: max hash), via pointer doubling.
    *
    * `maxDepth` bounds the walk: after k rounds the reached set covers
    * ancestor distances [0, 2^k), so ⌈log₂ maxDepth⌉ rounds suffice — the
    * round count is KNOWN up front and no per-round fixpoint count is
    * needed — that removes one driver-blocking job per round (VERDICT r2
    * item 7: g1 was the slowest query purely from those actions; measured:
    * lazy checkpoints are WORSE — the chained-AQE mega-plan re-optimizes
    * per stage — so rounds stay eager, just count-free). */
  /** Rounds the doubling walk needs for a depth-`maxDepth` chain:
    * ⌈log₂(maxDepth−1)⌉, never less than 1 — exposed so the deep-chain
    * stress spec can assert the logarithmic bound arithmetically. */
  private[graft] def roundsFor(maxDepth: Long): Int = math.max(1,
    64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxDepth - 1)))

  def canonicalChain(blocks: DataFrame, maxDepth: Long = WalkWindow + 3): DataFrame = {
    val rounds = roundsFor(maxDepth)
    val b = blocks.localCheckpoint(true)
    val tip = b.orderBy(col("height").desc, col("block_hash").desc).limit(1)
    var reached = tip.select(col("block_hash").as("h")).localCheckpoint(true)
    var jump = b.select(col("block_hash").as("h"), col("parent_hash").as("a"))
      .localCheckpoint(true)
    for (k <- 1 to rounds) {
      // increment := jump_k(S_k). After k rounds S covers ancestor distances
      // [0, 2^k) and jump maps +2^k, so the increment covers [2^k, 2^(k+1))
      // — DISJOINT from S (ancestors of one tip form a path; distances are
      // unique). No distinct() needed; past-genesis rounds add nothing
      // (inner join on an emptied jump map).
      val incPart = reached.join(jump, Seq("h"))
        .select(col("a").as("h"), lit(null).cast("string").as("a"),
          lit("r").as("t"))
      // jump := jump ∘ jump — 2^k-step ancestor map; empties past genesis.
      // Not needed after the final increment. Fused into the SAME tagged
      // union so each round materializes with ONE driver-blocking job
      // (separate checkpoints doubled the round latency — measured).
      val step =
        if (k == rounds) incPart.localCheckpoint(true)
        else incPart.unionByName(
          jump.as("x").join(jump.as("y"), col("x.a") === col("y.h"))
            .select(col("x.h").as("h"), col("y.a").as("a"), lit("j").as("t")))
          .localCheckpoint(true)
      // narrow filters over the cached step — no further jobs
      reached = reached.unionByName(
        step.filter(col("t") === "r").select(col("h")))
      jump = step.filter(col("t") === "j").select(col("h"), col("a"))
    }
    b.join(reached.withColumnRenamed("h", "block_hash"), "block_hash")
  }

  /** G1 query — canonical rows of the derived fork tree. */
  private val g1: Q = (s, d) =>
    canonicalChain(chainTable(s, d))
      .select(col("height"), col("block_hash"))
      .orderBy(col("height"), col("block_hash"))

  /** G2 — branch registry (rpc.js:311-318): every branch of the block tree
    * as (tip, tip height, depth, root), where a tip is a block no other
    * block points at, depth counts the blocks from the tip back to its
    * in-window root, and root is that deepest reachable ancestor.
    *
    * Scale design: BINARY LIFTING. The 2^k-ancestor maps J_0..J_K are the
    * same doubling tables the canonical walk builds (each only maps nodes
    * whose full 2^k chain exists — J_0 joins blocks to blocks, so a
    * window-edge parent pointer never fabricates a phantom node). All tips
    * then lift TOGETHER, descending k: one left join per level moves every
    * tip as far as 2^k if it can. K = ⌈log₂ maxDepth⌉ joins total for ALL
    * branches at once — never a per-branch sequential walk. */
  def branchRegistry(blocks: DataFrame, maxDepth: Long = WalkWindow + 3): DataFrame = {
    val levels = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxDepth - 1)))
    val b = blocks.localCheckpoint(true)
    // tips: no block claims them as parent
    val tips = b.as("t")
      .join(b.as("c"), col("t.block_hash") === col("c.parent_hash"), "left_anti")
      .select(col("t.block_hash").as("tip_hash"), col("t.height").as("tip_height"))
    // J_0 maps h -> parent only where the parent exists in-window
    var jump = b.as("x")
      .join(b.as("p"), col("x.parent_hash") === col("p.block_hash"))
      .select(col("x.block_hash").as("h"), col("p.block_hash").as("a"))
      .localCheckpoint(true)
    var jumps = List(jump) // jumps.head = J_k (largest step)
    for (_ <- 1 until levels) {
      jump = jump.as("x")
        .join(jump.as("y"), col("x.a") === col("y.h"))
        .select(col("x.h").as("h"), col("y.a").as("a"))
        .localCheckpoint(true)
      jumps = jump :: jumps
    }
    // descending lift: frontier is one row per tip, never wider
    var frontier = tips
      .withColumn("cur", col("tip_hash"))
      .withColumn("depth", lit(1L)) // count the tip itself
    jumps.zipWithIndex.foreach { case (j, i) =>
      val step = 1L << (levels - 1 - i)
      frontier = frontier
        .join(j.withColumnRenamed("h", "cur"), Seq("cur"), "left")
        .withColumn("depth",
          when(col("a").isNotNull, col("depth") + step).otherwise(col("depth")))
        .withColumn("cur", coalesce(col("a"), col("cur")))
        .drop("a")
    }
    frontier.select(col("tip_hash"), col("tip_height"), col("depth"),
      col("cur").as("root_hash"))
  }

  /** G2 query — branch registry of the derived fork tree. Branch-tip
    * heights can collide with main-chain heights, so the order key is
    * (height desc, hash). */
  private val g2: Q = (s, d) =>
    branchRegistry(chainTable(s, d))
      .orderBy(col("tip_height").desc, col("tip_hash"))

  /** Main chain with parents corrupted at every 1009th height — P2's input
    * needs genuine linkage breaks. */
  private[graft] def linkTable(s: SparkSession, d: String): DataFrame = {
    // NOT a fanned read: the md5 chain derivation looked like a fan-out
    // candidate, but the isolated A/B measured g1/g2 ~1 s WORSE fanned
    // (the walk's repeated consumers each pay the exchange; the md5 work
    // is only ~0.5 s single-core at sf0.1) and p2 a wash
    val o = Tables.orders(s, d)
    val k = col("o_orderkey")
    o.select(
      h("m", k).as("block_hash"),
      when(k % 1009 === 0, h("x", k)).otherwise(h("m", k - 1)).as("parent_hash"),
      k.as("height"))
  }

  /** P2 query — lag-dependent chain-linkage filter: scanning height-DESC
    * from the tip, a row survives only while every link above it held
    * (rpc.js:156-175 keeps a row iff it chains to the previous KEPT row;
    * on a unique-height chain that is exactly "no broken link above me").
    *
    * Bucketed two-pass (operators.Windows.PrefixBucket scale note): the lag
    * and the suffix-max both run bucket-local in parallel; the only
    * cross-bucket state is one row per bucket — the bucket's last hash
    * (feeds the next bucket's first lag) and whether any link in it broke
    * (suffix-OR'd over the bucket relation, then broadcast back). No
    * partition-less window ever sees the full chain. */
  private val p2: Q = (s, d) => {
    val bw = graft.operators.Windows.PrefixBucket
    val t = linkTable(s, d)
      .withColumn("bkt", floor(col("height") / bw).cast("long"))
    val byH = Window.partitionBy(col("bkt")).orderBy(col("height"))
    // ONE fact-table window stage: both the lag and the strictly-above
    // suffix max share the same (bkt, height ASC) partitioning+sort — the
    // suffix frame is (1 FOLLOWING, UNBOUNDED), not a second DESC sort.
    // internal_broken only sees WITHIN-bucket links; boundary links are
    // settled at the bucket level below.
    val w = t
      .withColumn("local_prev", lag(col("block_hash"), 1).over(byH))
      .withColumn("internal_broken",
        when(col("local_prev").isNotNull &&
          col("parent_hash") =!= col("local_prev"), 1).otherwise(0))
      .withColumn("local_above", coalesce(max(col("internal_broken")).over(
        byH.rowsBetween(1, Window.unboundedFollowing)), lit(0)))
    // (w is consumed twice — bucket agg + final join. Measured: recomputing
    // the scan+window beats caching it; the bucket agg's shuffle is one row
    // per bucket either way.)
    // bucket relation: partial-aggregated map-side, so the shuffle carries
    // one row per bucket. A bucket's "any break" = any internal break OR
    // its first link not matching the previous bucket's last hash; the
    // carry for bucket k is then any break in buckets ABOVE k. (A bucket's
    // own boundary break sits at its lowest row — below every other row in
    // it — so it belongs to the carry of lower buckets only, matching the
    // row-level semantics exactly.)
    val bkts = w.groupBy(col("bkt")).agg(
        max_by(col("block_hash"), col("height")).as("last_hash"),
        min_by(col("parent_hash"), col("height")).as("first_parent"),
        max(col("internal_broken")).as("internal_any"))
      .withColumn("prev_last", lag(col("last_hash"), 1).over(Window.orderBy(col("bkt"))))
      .withColumn("boundary_broken",
        when(col("prev_last").isNotNull &&
          col("first_parent") =!= col("prev_last"), 1).otherwise(0))
      .withColumn("bkt_any", greatest(col("internal_any"), col("boundary_broken")))
      .withColumn("carry_above", coalesce(max(col("bkt_any")).over(
        Window.orderBy(col("bkt").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)))
      .select(col("bkt"), col("carry_above"))
    // broadcast join + filter: no further shuffle of the fact rows
    w.join(broadcast(bkts), Seq("bkt"))
      .filter(greatest(col("local_above"), col("carry_above")) === 0)
      .select(col("height"), col("block_hash"))
      .orderBy(col("height"))
  }

  val queries: Map[String, Q] = Map(
    "g1_fork_walk" -> g1,
    "g2_branch_registry" -> g2,
    "p2_chain_filter" -> p2
  )

  private val chainSql =
    s"""bounds AS (SELECT max(o_orderkey) AS hi FROM orders),
       | keys AS (SELECT o_orderkey AS k FROM orders, bounds WHERE o_orderkey > hi - $WalkWindow),
       | blocks AS (
       |   SELECT md5('m' || CAST(k AS VARCHAR)) AS block_hash,
       |          md5('m' || CAST(k - 1 AS VARCHAR)) AS parent_hash,
       |          k AS height
       |   FROM keys
       |   UNION ALL
       |   SELECT md5('b' || CAST(k AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
       |          CASE WHEN i = 1 THEN md5('m' || CAST(k - 1 AS VARCHAR))
       |               ELSE md5('b' || CAST(k AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)) END,
       |          k - 1 + i
       |   FROM keys, (SELECT unnest(range(1, 4)) AS i) g WHERE k % 97 = 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "g1_fork_walk" ->
      s"""WITH RECURSIVE $chainSql,
         | tip AS (SELECT block_hash, parent_hash, height FROM blocks
         |   ORDER BY height DESC, block_hash DESC LIMIT 1),
         | walk AS (
         |   SELECT block_hash, parent_hash, height FROM tip
         |   UNION ALL
         |   SELECT b.block_hash, b.parent_hash, b.height
         |   FROM blocks b JOIN walk w ON b.block_hash = w.parent_hash)
         | SELECT height, block_hash FROM walk ORDER BY height, block_hash""".stripMargin,
    "g2_branch_registry" ->
      s"""WITH RECURSIVE $chainSql,
         | tips AS (SELECT b.block_hash AS tip_hash, b.height AS tip_height
         |   FROM blocks b
         |   WHERE NOT EXISTS (SELECT 1 FROM blocks c WHERE c.parent_hash = b.block_hash)),
         | walk AS (
         |   SELECT t.tip_hash, t.tip_height, b.block_hash AS cur, b.parent_hash,
         |          CAST(1 AS BIGINT) AS depth
         |   FROM tips t JOIN blocks b ON b.block_hash = t.tip_hash
         |   UNION ALL
         |   SELECT w.tip_hash, w.tip_height, b.block_hash, b.parent_hash, w.depth + 1
         |   FROM walk w JOIN blocks b ON b.block_hash = w.parent_hash)
         | SELECT tip_hash, tip_height, CAST(max(depth) AS BIGINT) AS depth,
         |        max_by(cur, depth) AS root_hash
         | FROM walk GROUP BY 1, 2 ORDER BY tip_height DESC, tip_hash""".stripMargin,
    "p2_chain_filter" ->
      s"""WITH c AS (
         |   SELECT md5('m' || CAST(o_orderkey AS VARCHAR)) AS block_hash,
         |          CASE WHEN o_orderkey % 1009 = 0
         |               THEN md5('x' || CAST(o_orderkey AS VARCHAR))
         |               ELSE md5('m' || CAST(o_orderkey - 1 AS VARCHAR)) END AS parent_hash,
         |          o_orderkey AS height
         |   FROM orders),
         | w AS (SELECT height, block_hash, parent_hash,
         |   lag(block_hash) OVER (ORDER BY height) AS prev_hash FROM c),
         | w2 AS (SELECT height, block_hash,
         |   CASE WHEN prev_hash IS NOT NULL AND parent_hash <> prev_hash THEN 1 ELSE 0 END AS broken FROM w),
         | w3 AS (SELECT height, block_hash,
         |   max(broken) OVER (ORDER BY height DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS broken_above FROM w2)
         | SELECT height, block_hash FROM w3
         | WHERE broken_above IS NULL OR broken_above = 0 ORDER BY height""".stripMargin
  )
}
