package graft.plans

import graft.Tables
import graft.functions.ExactRatio
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G3 — PAGERANK over the customer–supplier bipartite graph: iterative
  * graph analytics beyond the fork-walk's path queries and the dedup
  * layer's connected components (reach, importance, influence — the
  * centrality question every entity-graph pipeline eventually asks).
  *
  * Scale shape: classic Pregel-as-joins. The degree-annotated edge list is
  * materialized ONCE (localCheckpoint — every round reuses it, the same
  * eager-round discipline as ForkWalk/connectedComponents); each of the
  * fixed [[Iters]] rounds is one equi-join (rank → edges) and one
  * map-side-partial aggregation (contributions → nodes), so a round costs
  * one shuffle at edge grain and the loop never grows lineage. No
  * driver-side graph state; node count never materializes on the driver.
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

  /** Undirected degree-annotated bipartite edges: customer c<id> — each
    * supplier s<id> they ever bought from (both directions, distinct). */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("u"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("v"))
      .distinct()
    e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
  }

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

  /** The top-[[Top]] ranked nodes after [[Iters]] exact milli rounds. */
  private val g3: Q = (s, d) =>
    ranksOf(edges(s, d))
      .orderBy(col("rank_milli").desc, col("node"))
      .limit(Top)

  /** G4 — TRIANGLE COUNT over the supplier co-part graph (suppliers are
    * adjacent iff some part flows through both): the density/community
    * probe of graph curation, and the canonical distributed-graph scale
    * pattern — edges are ORDERED (a < b), so each triangle (a < b < c) is
    * generated exactly once by two equi-joins (wedges a–b–c closed by the
    * a–c edge) and no node ever enumerates its full neighborhood twice.
    * Cost at 100 TB: one shuffle per join at edge grain; the ordering
    * halves the wedge count and removes the 6× duplicate triangles a
    * naive closed-walk count produces. Summary row: nodes, edges,
    * triangles — the global clustering shape. */
  private val g4: Q = (s, d) => {
    val sp = Tables.lineitem(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
    val e = sp.as("x").join(sp.as("y"), col("x.pk") === col("y.pk"))
      .filter(col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
      .distinct()
      .localCheckpoint(true)
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

  val queries: Map[String, Q] = Map("g3_pagerank" -> g3, "g4_triangle_count" -> g4)

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
    s"""WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS u,
       |     's' || CAST(l_suppkey AS VARCHAR) AS v
       |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       | e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       | deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
       | r0 AS (SELECT u AS node, CAST(1000 AS BIGINT) AS r FROM deg),
       | $layers
       | SELECT node, r AS rank_milli FROM r$Iters
       | ORDER BY rank_milli DESC, node LIMIT $Top""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "g3_pagerank" -> pagerankSql,
    "g4_triangle_count" ->
      """WITH sp AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
        | e AS (SELECT DISTINCT x.sk AS a, y.sk AS b
        |   FROM sp x JOIN sp y ON x.pk = y.pk WHERE x.sk < y.sk),
        | tri AS (SELECT count(*) AS n_triangles
        |   FROM e e1 JOIN e e2 ON e1.b = e2.a
        |   JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
        | nn AS (SELECT count(*) AS n_nodes FROM
        |   (SELECT a AS n FROM e UNION SELECT b FROM e)),
        | ne AS (SELECT count(*) AS n_edges FROM e)
        | SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri""".stripMargin)
}
