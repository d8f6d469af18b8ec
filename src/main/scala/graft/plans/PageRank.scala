package graft.plans

import graft.Tables
import graft.functions.ExactRatio
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G3/G4 — graph analytics: PageRank centrality and triangle counting —
  * the influence and community-density probes an entity-graph pipeline
  * runs, beyond the fork-walk's path queries and the dedup layer's
  * connected components.
  *
  * Substrate (the ForkWalk doctrine): the graph is DERIVED deterministically
  * from a base table so both engines construct the identical edge set — a
  * path-with-chords over the contiguous customer key space (edges k→k+1
  * and k→k+2), sparse at every scale (degree ≤ 4), with a closed-form
  * triangle count (N−2) the spec verifies exactly. The tempting "natural"
  * graphs in this corpus fail at one scale or another: supplier co-part
  * adjacency is measured COMPLETE at sf0.1 (C(1000,2) edges — wedge
  * generation explodes), and user co-activity has zero triangles below
  * sf0.1 (too sparse to gate). Picking the graph is part of designing the
  * operator; [[ranksOf]] and the ordered-edge triangle pattern are
  * graph-generic and spec-driven on independent fixtures.
  *
  * Scale shape: classic Pregel-as-joins. The degree-annotated edge list is
  * materialized ONCE (localCheckpoint — every PageRank round reuses it,
  * the same eager-round discipline as ForkWalk/connectedComponents); each
  * of the fixed [[Iters]] rounds is one equi-join (rank → edges) and one
  * map-side-partial aggregation (contributions → nodes), so a round costs
  * one shuffle at edge grain and the loop never grows lineage. No
  * driver-side graph state.
  *
  * Determinism doctrine: ranks are MILLI-SCALED INTEGERS end to end —
  * init 1000/node, per-step contribution = round-half-up(r/deg) and
  * damping = 150 + round-half-up(17·Σ/20) via the shared ExactRatio, so
  * every engine computes bit-identical integers every round (float
  * PageRank is never cross-engine comparable; the ≤0.5-milli-per-step
  * rounding is part of the operator's spec'd semantics, not noise). The
  * DuckDB oracle unrolls the same rounds as CTE layers generated from the
  * SAME iteration count and ratio helper — one definition, two engines. */
object PageRank {
  type Q = (SparkSession, String) => DataFrame

  private[plans] val Iters = 5
  private val Top = 50

  /** Ordered (a < b) path-with-chords edges over customer keys:
    * k→k+1 and k→k+2 for every key with the neighbor in range. */
  private[graft] def chordEdges(s: SparkSession, d: String): DataFrame = {
    val n = Tables.customer(s, d).agg(max(col("c_custkey")).cast("long").as("n"))
    val c = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("a"))
      .crossJoin(broadcast(n))
    c.filter(col("a") + 1L <= col("n"))
      .select(col("a"), (col("a") + 1L).as("b"))
      .unionByName(c.filter(col("a") + 2L <= col("n"))
        .select(col("a"), (col("a") + 2L).as("b")))
  }

  private[graft] def symmetric(e: DataFrame): DataFrame =
    e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))

  /** Full node ranks after `iters` exact milli rounds over any undirected
    * edge frame (u, v) — the reusable core; the spec drives it on golden
    * graphs with hand-computed integer expectations. */
  def ranksOf(e: DataFrame, iters: Int = Iters): DataFrame = {
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "u").localCheckpoint(true) // (u, v, deg), reused per round
    val nodes = deg.select(col("u").as("node")).localCheckpoint(true)
    var rank = nodes.select(col("node"), lit(1000L).as("r"))
    for (_ <- 1 to iters) {
      val contribs = ed.join(rank, col("u") === col("node"))
        .groupBy(col("v"))
        .agg(sum(ExactRatio.scaled(col("r"), col("deg"), 1L)).as("sum_c"))
        .withColumnRenamed("v", "node")
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"), (lit(150L) + ExactRatio.scaled(
          lit(17L) * coalesce(col("sum_c"), lit(0L)), lit(20L), 1L)).as("r"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), col("r").as("rank_milli"))
  }

  /** G3 — the top-[[Top]] ranked nodes after [[Iters]] exact milli rounds. */
  private val g3: Q = (s, d) =>
    ranksOf(symmetric(chordEdges(s, d)))
      .orderBy(col("rank_milli").desc, col("node"))
      .limit(Top)

  /** G4 — TRIANGLE COUNT by the canonical distributed pattern: edges stay
    * ORDERED (a < b), so each triangle (a < b < c) is generated exactly
    * once by two equi-joins (wedges a–b–c closed by the a–c edge) and no
    * node ever enumerates its full neighborhood twice; the ordering
    * halves the wedge count and removes the 6× duplicates a closed-walk
    * count produces. One summary row: nodes, edges, triangles (= N−2 on
    * the chord graph — spec-pinned in closed form). */
  private val g4: Q = (s, d) => {
    val e = chordEdges(s, d).localCheckpoint(true)
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val tri = wedges.as("w").join(e.as("e3"),
      col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val nn = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .distinct().agg(count(lit(1)).as("n_nodes"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
  }

  /** g5 seed spacing: every 32nd key is a distance-0 source. The BFS
    * round budget follows from the SPACING, not the graph size — the
    * farthest node sits ≤ 31 keys from a seed, chords halve hops, so 16
    * rounds reach everything at ANY scale. That is the design point:
    * multi-source BFS depth is bounded by source density, which a
    * pipeline controls, never by corpus growth. */
  private[graft] val SeedMod = 32L
  private[graft] val SeedMod2 = 8L
  private[plans] val BfsRounds = 16

  /** Min-distance propagation over any symmetric edge frame (u, v) from
    * a seed node set — the reusable core, spec-driven on golden graphs.
    * Each round relaxes every edge once: one equi-join (reached frontier
    * → edges) + one min-aggregation, eager-checkpointed so rounds never
    * grow lineage (the ForkWalk/PageRank discipline). `cap` is a BUDGET,
    * not a count: the loop exits one round after the fixpoint (a no-op
    * round proves convergence — the observable [[bfsOfCounted]] exposes),
    * so the spacing bound pays only detection, never wasted relaxation.
    * After `cap` ≥ max eccentricity-to-seed, the frame is the exact hop
    * distance; with a smaller cap, beyond-cap nodes stay honestly null. */
  def bfsOf(e: DataFrame, seeds: DataFrame, cap: Int = BfsRounds): DataFrame =
    bfsOfCounted(e, seeds, cap)._1

  /** [[bfsOf]] plus the relaxation rounds actually run — eccentricity+1
    * when the cap is generous (the +1 is the convergence check), `cap`
    * exactly when it binds. The improvement flag rides the same
    * checkpointed frame as the distances, so detection is one driver-side
    * head(1) per round, never a second pass over the edges. */
  private[graft] def bfsOfCounted(
      e: DataFrame, seeds: DataFrame, cap: Int): (DataFrame, Int) = {
    val ed = e.localCheckpoint(true)
    val nodes = ed.select(col("u").as("node")).distinct().localCheckpoint(true)
    var dist = nodes
      .join(seeds.select(col("node")).withColumn("d0", lit(0L)), Seq("node"), "left")
      .select(col("node"), col("d0").as("d")).localCheckpoint(true)
    var rounds = 0
    var changed = true
    while (changed && rounds < cap) {
      val relax = ed.join(dist.filter(col("d").isNotNull),
          col("u") === col("node"))
        .groupBy(col("v")).agg(min(col("d") + 1L).as("nd"))
      val next = dist.join(relax, col("node") === col("v"), "left")
        .select(col("node"), least(col("d"), col("nd")).as("d"),
          (col("nd") < col("d") ||
            (col("d").isNull && col("nd").isNotNull)).as("imp"))
        .localCheckpoint(true)
      changed = next.filter(col("imp")).head(1).nonEmpty
      dist = next.select(col("node"), col("d"))
      rounds += 1
    }
    (dist.select(col("node"), col("d").as("dist")), rounds)
  }

  /** G5 — MULTI-SOURCE BFS / hop distance to the nearest seed: the
    * proximity primitive behind influence radii, seed-expansion labeling,
    * and staleness-from-source checks. [[bfsOf]] over the chord graph
    * with every [[SeedMod]]-th key seeded; [[BfsRounds]] rounds reach all
    * nodes by the spacing argument, and the spec pins the closed-form
    * distance ⌈min(gap_down, gap_up)/2⌉ per node. */
  private def g5Of(mod: Long): Q = (s, d) => {
    val e = symmetric(chordEdges(s, d))
    val seeds = e.select(col("u").as("node")).distinct()
      .filter(col("node") % mod === 1L)
    bfsOf(e, seeds).orderBy(col("node"))
  }
  private val g5 = g5Of(SeedMod)
  private val g5b = g5Of(SeedMod2)

  val queries: Map[String, Q] = Map(
    "g3_pagerank" -> g3, "g4_triangle_count" -> g4,
    "g5_bfs_distance" -> g5, "g5b_bfs_dense" -> g5b)

  private val edgeCte =
    """nmax AS (SELECT CAST(max(c_custkey) AS BIGINT) AS n FROM customer),
      | e0 AS (SELECT CAST(c_custkey AS BIGINT) AS a, CAST(c_custkey + 1 AS BIGINT) AS b
      |   FROM customer, nmax WHERE c_custkey + 1 <= n
      |  UNION ALL
      |  SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey + 2 AS BIGINT)
      |   FROM customer, nmax WHERE c_custkey + 2 <= n)""".stripMargin

  /** The identical rounds as unrolled CTE layers — generated from the same
    * Iters/ExactRatio definitions the Spark loop uses. */
  private def pagerankSql: String = {
    val layers = (1 to Iters).map { k =>
      val prev = s"r${k - 1}"
      s"""s$k AS (SELECT e.v AS node,
         |   CAST(sum(${ExactRatio.scaledSql("r.r", "deg.d", 1L)}) AS BIGINT) AS sum_c
         |  FROM e JOIN deg ON e.u = deg.u JOIN $prev r ON e.u = r.node
         |  GROUP BY 1),
         | r$k AS (SELECT deg.u AS node,
         |   CAST(150 + ${ExactRatio.scaledSql(s"17 * coalesce(s$k.sum_c, 0)", "20", 1L)} AS BIGINT) AS r
         |  FROM deg LEFT JOIN s$k ON deg.u = s$k.node)""".stripMargin
    }.mkString(",\n ")
    s"""WITH $edgeCte,
       | e AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
       | deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
       | r0 AS (SELECT u AS node, CAST(1000 AS BIGINT) AS r FROM deg),
       | $layers
       | SELECT node, r AS rank_milli FROM r$Iters
       | ORDER BY rank_milli DESC, node LIMIT $Top""".stripMargin
  }

  private def g5SqlOf(mod: Long): String =
    s"""WITH RECURSIVE $edgeCte,
       | e AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
       | r(node, d) AS (
       |   SELECT DISTINCT u, 0 FROM e WHERE u % $mod = 1
       |   UNION
       |   SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.node
       |   WHERE r.d < $BfsRounds)
       | SELECT node, CAST(min(d) AS BIGINT) AS dist FROM r
       | GROUP BY 1 ORDER BY node""".stripMargin

  val oracles: Map[String, String] = Map(
    // independent formulation: recursive frontier enumeration with row
    // dedup (UNION) + depth cap, min per node — agreeing with the
    // round-relaxation loop proves both
    "g5_bfs_distance" -> g5SqlOf(SeedMod),
    "g5b_bfs_dense" -> g5SqlOf(SeedMod2),
    "g3_pagerank" -> pagerankSql,
    "g4_triangle_count" ->
      s"""WITH $edgeCte,
         | tri AS (SELECT count(*) AS n_triangles
         |   FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a
         |   JOIN e0 e3 ON e1.a = e3.a AND e2.b = e3.b),
         | nn AS (SELECT count(*) AS n_nodes FROM
         |   (SELECT a AS n FROM e0 UNION SELECT b FROM e0)),
         | ne AS (SELECT count(*) AS n_edges FROM e0)
         | SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri""".stripMargin)
}
