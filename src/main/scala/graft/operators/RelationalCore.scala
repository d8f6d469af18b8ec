package graft.operators

import graft.{Domain, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, projections, joins (SURVEY.md §2.1–2.3).
  *
  * Every query is a declarative DataFrame plan so Catalyst pushes predicates
  * and prunes columns into the parquet scan; each carries an explicit total
  * order so the DuckDB-oracle hash compare is deterministic.
  */
object RelationalCore {
  type Q = (SparkSession, String) => DataFrame

  /** S1 — full-table scan, no predicate (burnchain ops, rpc.js:60,342).
    * Full column set, deterministic order for the gate. */
  private val s1: Q = (s, d) =>
    Tables.nation(s, d).orderBy(col("n_nationkey"))

  /** S10 — top-3 newest (rpc.js:530-532). */
  private val s10: Q = (s, d) => s2(s, d).limit(3)

  /** S2 — sorted full scan (snapshots ORDER BY height DESC, rpc.js:63). */
  private val s2: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey").desc)

  /** S9 — top-10 newest (rpc.js:501). */
  private val s9: Q = (s, d) => s2(s, d).limit(10)

  /** S11 — filtered scan with pushed-down predicate (rpc.js:549). */
  private val s11: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** S12 — latest processed row: filter + ORDER BY DESC LIMIT 1 (rpc.js:604). */
  private val s12: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_extendedprice"))
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc)
      .limit(1)

  /** P1 — validity filter (pox_valid !== 0, rpc.js:159). */
  private val p1: Q = (s, d) =>
    Domain.snapshots(s, d)
      .filter(col("status") =!= "O")
      .select(col("block_height"), col("status"), col("total_burn_cents"))
      .orderBy(col("block_height"))

  /** P3/P4 — height-range scan with the reference's startblock/endblock
    * route parameters as REAL arguments (rpc.js:12-24, server.js:143-158),
    * not pinned constants. The BETWEEN reaches the parquet scan's
    * PushedFilters at any parameter setting — ParamSpec plan-asserts it for
    * both registered parameterizations. */
  def heightRange(startBlock: Long, endBlock: Long): Q = (s, d) =>
    Domain.commits(s, d)
      .filter(col("stacks_block_height").between(startBlock, endBlock))
      .orderBy(col("stacks_block_height"), col("vtxindex"))

  /** Oracle mirror generated from the same parameters. */
  def heightRangeSql(startBlock: Long, endBlock: Long): String =
    s"SELECT l_orderkey AS stacks_block_height, ${Domain.feeSql} AS burn_fee, " +
      s"l_suppkey AS leader_key_address, l_linenumber AS vtxindex FROM lineitem " +
      s"WHERE l_orderkey BETWEEN $startBlock AND $endBlock " +
      "ORDER BY stacks_block_height, vtxindex"

  private val p3 = heightRange(100L, 200L)
  private val p3b = heightRange(40L, 900L)

  /** P6 — sentinel-prefix: newest snapshots up to and including the first one
    * with a sortition (rpc.js:510-515). Bounded to the newest 1000 so the
    * global window never sees more than a constant number of rows at scale. */
  private val p6: Q = (s, d) => {
    val top = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey").desc).limit(1000)
    val w = Window.orderBy(col("o_orderkey").desc)
    val ranked = top.withColumn("rn", row_number().over(w))
    val firstHit = ranked.filter(col("o_orderstatus") === "F")
      .agg(min(col("rn")).as("first_rn"))
    ranked.crossJoin(broadcast(firstHit))
      .filter(col("rn") <= col("first_rn"))
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey").desc)
  }

  /** J3 — commits ⋈ snapshots equi-join (rpc.js:196-205). The fact side
    * shuffles on the join key; AQE picks broadcast when the dim side fits. */
  private val j3: Q = (s, d) => {
    val c = Domain.commits(s, d)
    val snap = Domain.snapshots(s, d).select(col("block_height"), col("status"))
    c.join(snap, c("stacks_block_height") === snap("block_height"), "inner")
      .select(col("stacks_block_height"), col("vtxindex"), col("burn_fee"), col("status"))
      .orderBy(col("stacks_block_height"), col("vtxindex"))
  }

  /** J7 — two-column equi-join with miss tolerance (commit ⋈ leader_key on
    * (key_block_ptr, key_vtxindex), left + null check, rpc.js:128-148). */
  private val j7: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val pairs = li.filter(col("l_quantity") > 25)
      .groupBy(col("l_partkey").as("p_pk"), col("l_suppkey").as("p_sk"))
      .agg(min(col("l_shipdate")).as("first_ship"))
    li.join(pairs,
        li("l_partkey") === pairs("p_pk") && li("l_suppkey") === pairs("p_sk"),
        "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("first_ship"),
        col("first_ship").isNull.as("key_missing"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** J8/P5 — winner resolution: the commit matching winning_block_txid,
    * re-derived as per-height argmax (rpc.js:269; SURVEY §4 G1(b)) — a
    * max_by hash aggregation, not a window (Domain.winners). */
  private val j8: Q = (s, d) =>
    Domain.winners(s, d)
      .select(col("stacks_block_height"), col("leader_key_address"), col("burn_fee"))
      .orderBy(col("stacks_block_height"))

  /** J9 — join on a computed key (stacks_block_id digest, rpc.js:320-336).
    * Aggregate-before-join: the count is key-associative, so the fact side
    * collapses to one row per key before hashing — 1/4 the md5 calls, and
    * the shuffle carries longs instead of 32-char digests. */
  private val j9: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("o_h"))
    val l = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_txs"))
      .select(md5(col("l_orderkey").cast("string")).as("l_h"), col("n_txs"))
    o.join(l, o("o_h") === l("l_h"), "inner")
      .select(col("o_orderkey"), col("n_txs"))
      .orderBy(col("o_orderkey"))
  }

  /** J2 — grouped join: distinct miners per block, nested list form
    * (rpc.js:185-194). List pinned sorted and serialized CSV so the driver
    * comparator hashes a plain string (ADVICE r1). */
  private val j2: Q = (s, d) =>
    Domain.commits(s, d)
      .groupBy(col("stacks_block_height"))
      .agg(concat_ws(",", sort_array(collect_set(col("leader_key_address"))))
        .as("miners"))
      .orderBy(col("stacks_block_height"))

  /** J4/J5 — grouped join keyed on a second key (payments ⋈ snapshots on
    * consensus_hash, rpc.js:207-229): child rows nested per parent, list
    * serialized sorted (customer plays payments; orders the snapshot). */
  private val j4: Q = (s, d) => {
    val pay = Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      round(col("o_totalprice")).cast("long").as("amount"))
    Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(pay, col("c_custkey") === col("o_custkey"), "inner")
      .groupBy(col("c_custkey"))
      .agg(
        count(lit(1)).as("n_payments"),
        sum(col("amount")).as("total_paid"),
        concat_ws(";", transform(
          sort_array(collect_list(struct(col("o_orderkey"), col("amount")))),
          x => concat_ws(":", x.getField("o_orderkey"), x.getField("amount"))))
          .as("payments"))
      .orderBy(col("c_custkey"))
  }

  /** J10 — burnchain ops grouped by block hash (rpc.js:340-367): the group
    * key is a computed hash; counts per op variant. */
  private val j10: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        md5(col("l_orderkey").cast("string")).as("block_hash"),
        when(col("l_linenumber") % 2 === 0, "LeaderBlockCommit")
          .otherwise("LeaderKeyRegister").as("op_type"))
      .groupBy(col("block_hash"))
      .agg(
        count(lit(1)).as("n_ops"),
        sum(when(col("op_type") === "LeaderBlockCommit", 1L).otherwise(0L))
          .as("n_commits"))
      .orderBy(col("block_hash"))

  /** J11 — local vs remote stage compare (server.js:233-242): two 1-row
    * relations crossed, equality on height → canMine flag. The remote side
    * comes through the S16–S17 probe seam (sources.PeerProbe) — unset, it
    * resolves to the same derived table this oracle checks, so the gate
    * covers the default path and ProbeSpec covers the injected one. */
  private val j11: Q = (s, d) => {
    val local = Tables.lineitem(s, d)
      .agg(max(col("l_orderkey")).as("local_height"))
    local.crossJoin(broadcast(graft.sources.PeerProbe.remoteHeight(s, d)))
      .withColumn("can_mine", col("local_height") === col("remote_height"))
  }

  /** R1 — unnest: explode the nested per-height commit list back to flat
    * rows (mining_monitor_rpc.js:28-37) — the inverse of A8/R2. */
  private val r1: Q = (s, d) =>
    Domain.commits(s, d)
      .groupBy(col("stacks_block_height"))
      .agg(sort_array(collect_list(struct(col("vtxindex"), col("burn_fee")))).as("cl"))
      .select(col("stacks_block_height"), explode(col("cl")).as("c"))
      .select(col("stacks_block_height"),
        col("c.vtxindex").as("vtxindex"), col("c.burn_fee").as("burn_fee"))
      .orderBy(col("stacks_block_height"), col("vtxindex"), col("burn_fee"))

  /** R5 — UNPIVOT/melt (§2.9's remaining reshape primitive next to a17's
    * pivot, a18's cube, r1's unnest): the wide per-commit numeric columns
    * to (key, metric, value) long form via `stack` — one generator pass,
    * row-local, no shuffle; the shape profilers and metric stores ingest.
    * Values ride the shared integer-scaling conventions so both engines
    * emit identical longs. */
  private val r5: Q = (s, d) =>
    Tables.lineitem(s, d).selectExpr(
      "l_orderkey AS height", "l_linenumber AS vtxindex",
      "stack(3, " +
        "'discount_bp', CAST(round(l_discount * 10000) AS BIGINT), " +
        "'fee', CAST(round(l_extendedprice) AS BIGINT), " +
        "'quantity', CAST(l_quantity AS BIGINT)) AS (metric, value_scaled)")
      .orderBy(col("height"), col("vtxindex"), col("metric"))

  /** J13 — RANGE (interval-overlap) JOIN: urgent-order promotion windows
    * [o_orderdate, +14 d) matched against every lineitem shipped inside
    * them, aggregated per window. A raw inequality join has no equi-key, so
    * Spark would plan a broadcast-nested-loop — |intervals| × |probes| work.
    * The scale form is BUCKETED: quantize time into fixed-width buckets,
    * explode each interval to the buckets it covers (≤2 at this width),
    * equi-join probes on the bucket key, then re-check the exact range.
    * The shuffle is keyed by bucket — linear in each side — and the count/
    * sum aggregate takes map-side partials. Bucket width is the tuning
    * knob: wider ⇒ fewer interval replicas but looser pre-filter. */
  private val dayUs = 86400000000L

  /** j13's probe-side rollup: every fact row collapses to its DISTINCT
    * timestamp with distributive partials (count, qty sum). The range
    * predicate reads ONLY ship_us and the window aggregates are
    * distributive, so pushing the aggregate BELOW the range join is an
    * exact rewrite — and ship_us is date-grained over a fixed calendar
    * (~2.5 k distinct values at EVERY scale factor; ScaleUp replicates
    * rows, not the calendar), so the fact side of the join collapses from
    * |lineitem| rows to a constant-size relation. One map-side-combined
    * groupBy scan replaces the 10⁹-row candidate join: the honest bench
    * measured the old plan (bucket join at raw row grain) at 813 s at
    * sf10 — Σ|window∩probe| is 50 B pairs there, quadratic in sf by the
    * query's own density — vs ~2 s for this plan, whose work is the scan
    * plus a windows × slack·2.5 k-row join. The same rewrite is the 100 TB
    * shape: pre-aggregate to the predicate's grain whenever the range
    * consumer is a distributive aggregate (a per-row range join that
    * cannot collapse keeps the bucket form below). */
  private[graft] def j13ProbeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_quantity"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .groupBy(col("ship_us"))
      .agg(count(lit(1)).as("n_at_us"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_at_us"))

  /** j13's bucket-equi-join candidate stage over the rolled-up probe side,
    * split out so the scale probe can count candidate rows vs true matches
    * without copying the plan (Probe j13). 4-day buckets against the
    * 14-day window: candidate slack (B+W)/W ≈ 1.29× at ≤ ⌈W/B⌉+1 = 5
    * bucket replicas per interval — both sides of this join are small
    * (windows, and the ~2.5 k distinct timestamps), so the replicas and
    * slack multiply near-nothing. */
  private[graft] def j13Candidates(s: SparkSession, d: String): DataFrame = {
    val bucketUs = 4L * dayUs
    val iv = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey").as("win_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("win_start_us"))
      .withColumn("win_end_us", col("win_start_us") + lit(14L * dayUs))
      .withColumn("bkt", explode(sequence(
        floor(col("win_start_us") / bucketUs).cast("long"),
        floor(col("win_end_us") / bucketUs).cast("long"))))
    val probes = j13ProbeAgg(s, d)
      .withColumn("bkt", floor(col("ship_us") / bucketUs).cast("long"))
    iv.join(probes, Seq("bkt"))
  }

  /** j13's exact-range recheck over the candidates — the true match set
    * (at rolled-up grain: each row carries its timestamp's partials). */
  private[graft] def j13Matches(s: SparkSession, d: String): DataFrame =
    j13Candidates(s, d)
      .filter(col("ship_us") >= col("win_start_us") && col("ship_us") < col("win_end_us"))

  private val j13: Q = (s, d) => {
    j13Matches(s, d)
      .groupBy(col("win_id"))
      .agg(sum(col("n_at_us")).as("n_ship"),
        sum(col("qty_at_us")).as("qty_cents"))
      .orderBy(col("win_id"))
  }

  /** J14 — LEFT-SEMI join: registered leader keys that actually placed a
    * qualifying commit (the membership filter implied by the reference's
    * key→commit linkage, rpc.js:137-148 — "does this key appear at all?").
    * A semi join is the scale-correct form of `IN (subquery)`: the probe
    * side streams, the build side reduces to DISTINCT KEYS before the
    * hash table (no fact-row multiplication, no payload columns shuffled),
    * and AQE broadcasts the key set when it fits. */
  private val j14: Q = (s, d) => {
    val hits = Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(hits, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .orderBy(col("s_suppkey"))
  }

  /** J15 — LEFT-ANTI join: customers with NO urgent order — the set-level
    * inverse of J7's per-row missing-key flag (rpc.js:140-147 skips
    * commits whose leader key is absent; the anti join asks which keys
    * are never referenced — orphan detection). Same scale shape as J14:
    * the filter runs BEFORE the join, so the anti side reduces to the
    * distinct keys of the qualifying subset pre-hash. (The unfiltered
    * form is vacuous on this data — every customer has some order — so
    * the gate would hash an empty set.) */
  private val j15: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))

  val queries: Map[String, Q] = Map(
    "j14_semi_join" -> j14,
    "j15_anti_join" -> j15,
    "j13_range_join" -> j13,
    "s1_full_scan" -> s1,
    "s10_top3" -> s10,
    "j4_grouped_payments" -> j4,
    "j10_ops_by_block" -> j10,
    "j11_stage_compare" -> j11,
    "r1_explode_commits" -> r1,
    "r5_unpivot" -> r5,
    "s2_sorted_scan" -> s2,
    "s9_top10" -> s9,
    "s11_filtered_scan" -> s11,
    "s12_latest" -> s12,
    "p1_validity_filter" -> p1,
    "p3_height_range" -> p3,
    "p3_height_range_wide" -> p3b,
    "p6_sentinel_prefix" -> p6,
    "j2_miners_per_block" -> j2,
    "j3_commits_join" -> j3,
    "j7_two_col_leftjoin" -> j7,
    "j8_winner_commit" -> j8,
    "j9_computed_key_join" -> j9
  )

  private val fee = Domain.feeSql

  val oracles: Map[String, String] = Map(
    "j14_semi_join" ->
      """SELECT s_suppkey, s_name, s_nationkey FROM supplier s
        | WHERE EXISTS (SELECT 1 FROM lineitem l
        |   WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        | ORDER BY s_suppkey""".stripMargin,
    "j15_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        | ORDER BY c_custkey""".stripMargin,
    "j13_range_join" ->
      s"""WITH iv AS (SELECT o_orderkey AS win_id, epoch_us(o_orderdate) AS s_us,
         |   epoch_us(o_orderdate) + ${14L * 86400000000L} AS e_us
         |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 20 = 0)
         | SELECT win_id, count(*) AS n_ship,
         |   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
         | FROM iv JOIN lineitem ON epoch_us(l_shipdate) >= s_us AND epoch_us(l_shipdate) < e_us
         | GROUP BY 1 ORDER BY win_id""".stripMargin,
    "s1_full_scan" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "s10_top3" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 3",
    "j4_grouped_payments" ->
      """SELECT c.c_custkey, count(*) AS n_payments,
        |   CAST(sum(CAST(round(o.o_totalprice) AS BIGINT)) AS BIGINT) AS total_paid,
        |   string_agg(CAST(o.o_orderkey AS VARCHAR) || ':' || CAST(CAST(round(o.o_totalprice) AS BIGINT) AS VARCHAR), ';'
        |     ORDER BY o.o_orderkey, CAST(round(o.o_totalprice) AS BIGINT)) AS payments
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin,
    "j10_ops_by_block" ->
      """SELECT md5(CAST(l_orderkey AS VARCHAR)) AS block_hash, count(*) AS n_ops,
        |   CAST(sum(CASE WHEN l_linenumber % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_commits
        | FROM lineitem GROUP BY 1 ORDER BY block_hash""".stripMargin,
    "j11_stage_compare" ->
      """SELECT l.local_height, r.remote_height, l.local_height = r.remote_height AS can_mine
        | FROM (SELECT max(l_orderkey) AS local_height FROM lineitem) l,
        |      (SELECT max(o_orderkey) AS remote_height FROM orders) r""".stripMargin,
    "r1_explode_commits" ->
      s"SELECT l_orderkey AS stacks_block_height, l_linenumber AS vtxindex, $fee AS burn_fee FROM lineitem ORDER BY 1, 2, 3",
    "r5_unpivot" ->
      """WITH u AS (
        |  SELECT l_orderkey AS height, l_linenumber AS vtxindex,
        |    'discount_bp' AS metric, CAST(round(l_discount * 10000) AS BIGINT) AS value_scaled
        |  FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'fee',
        |    CAST(round(l_extendedprice) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'quantity',
        |    CAST(l_quantity AS BIGINT) FROM lineitem)
        | SELECT height, vtxindex, metric, value_scaled FROM u
        | ORDER BY height, vtxindex, metric""".stripMargin,
    "s2_sorted_scan" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey DESC",
    "s9_top10" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 10",
    "s11_filtered_scan" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F' ORDER BY l_orderkey, l_linenumber",
    "s12_latest" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F' ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 1",
    "p1_validity_filter" ->
      "SELECT o_orderkey AS block_height, o_orderstatus AS status, CAST(round(o_totalprice * 100) AS BIGINT) AS total_burn_cents FROM orders WHERE o_orderstatus <> 'O' ORDER BY block_height",
    "p3_height_range" -> heightRangeSql(100L, 200L),
    "p3_height_range_wide" -> heightRangeSql(40L, 900L),
    "p6_sentinel_prefix" ->
      """WITH top AS (SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey DESC LIMIT 1000),
        | ranked AS (SELECT o_orderkey, o_orderstatus, row_number() OVER (ORDER BY o_orderkey DESC) AS rn FROM top),
        | hit AS (SELECT min(rn) AS first_rn FROM ranked WHERE o_orderstatus = 'F')
        | SELECT o_orderkey, o_orderstatus FROM ranked, hit WHERE rn <= first_rn ORDER BY o_orderkey DESC""".stripMargin,
    "j2_miners_per_block" ->
      "SELECT l_orderkey AS stacks_block_height, array_to_string(list_sort(list_distinct(list(l_suppkey))), ',') AS miners FROM lineitem GROUP BY l_orderkey ORDER BY stacks_block_height",
    "j3_commits_join" ->
      s"SELECT l.l_orderkey AS stacks_block_height, l.l_linenumber AS vtxindex, $fee AS burn_fee, o.o_orderstatus AS status FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey ORDER BY stacks_block_height, vtxindex",
    "j7_two_col_leftjoin" ->
      """WITH pairs AS (SELECT l_partkey AS p_pk, l_suppkey AS p_sk, min(l_shipdate) AS first_ship FROM lineitem WHERE l_quantity > 25 GROUP BY 1, 2)
        | SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, p.first_ship, (p.first_ship IS NULL) AS key_missing
        | FROM lineitem l LEFT JOIN pairs p ON l.l_partkey = p.p_pk AND l.l_suppkey = p.p_sk
        | ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "j8_winner_commit" ->
      s"""SELECT l_orderkey AS stacks_block_height, l_suppkey AS leader_key_address, $fee AS burn_fee FROM (
         | SELECT *, ${Domain.winnerRnSql} AS rn FROM lineitem
         |) WHERE rn = 1 ORDER BY stacks_block_height""".stripMargin,
    "j9_computed_key_join" ->
      """SELECT o.o_orderkey, count(*) AS n_txs
        | FROM (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS o_h FROM orders) o
        | JOIN (SELECT md5(CAST(l_orderkey AS VARCHAR)) AS l_h FROM lineitem) l ON o.o_h = l.l_h
        | GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin
  )
}
