package graft

import graft.plans.ForkWalk
import org.apache.spark.sql.functions._

/** Golden-output tests for the G1 fork walk (SURVEY.md §5.5: the
  * highest-risk semantic, hand-built fixtures instead of an oracle). */
class ForkWalkSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("block_hash", StringType),
    StructField("parent_hash", StringType),
    StructField("height", LongType)))

  private def tree(rows: (String, String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)

  test("walk picks the deeper branch over the earlier one") {
    // g <- a2 <- a3   and   g <- b2 <- b3 <- b4 (deeper)
    val blocks = tree(
      ("g", "0", 1L),
      ("a2", "g", 2L), ("a3", "a2", 3L),
      ("b2", "g", 2L), ("b3", "b2", 3L), ("b4", "b3", 4L))
    val canon = ForkWalk.canonicalChain(blocks)
      .select("block_hash").collect().map(_.getString(0)).toSet
    assert(canon === Set("g", "b2", "b3", "b4"))
  }

  test("equal-depth fork resolves to the lexicographically larger tip") {
    val blocks = tree(
      ("g", "0", 1L),
      ("a2", "g", 2L), ("a3", "a2", 3L),
      ("z2", "g", 2L), ("z3", "z2", 3L))
    val canon = ForkWalk.canonicalChain(blocks)
      .select("block_hash").collect().map(_.getString(0)).toSet
    assert(canon === Set("g", "z2", "z3"))
  }

  test("single-node chain is its own canonical chain") {
    val blocks = tree(("g", "0", 1L))
    assert(ForkWalk.canonicalChain(blocks).count() === 1L)
  }

  test("long chain walks to genesis (pointer doubling covers all depths)") {
    // 300-block path: needs ceil(log2) = 9 doubling rounds, exercises the loop
    val rows = (1L to 300L).map(k => (s"h$k", if (k == 1) "0" else s"h${k - 1}", k))
    val canon = ForkWalk.canonicalChain(tree(rows: _*))
    assert(canon.count() === 300L)
  }

  test("deep chain stress: 1e5-deep walk completes in log-rounds and bounded time") {
    // VERDICT r5 item 6: the ⌈log₂⌉ claim proven at scale-shape, not toy
    // depth. The round count is asserted arithmetically (it is a pure
    // function of maxDepth — the walk never runs more jobs than that),
    // the walk itself at depth 10^5: correct coverage and a wall-clock
    // ceiling that a linear (10^5-round) walk could never meet.
    val depth = 100000L
    assert(ForkWalk.roundsFor(depth) === 17)          // = ceil(log2(1e5))
    assert(ForkWalk.roundsFor(depth) <=
      math.ceil(math.log(depth.toDouble) / math.log(2.0)).toInt)
    val ss = spark
    import ss.implicits._
    // derive the chain distributed — a 1e5-element driver Seq would test
    // the driver, not the walk
    val blocks = ss.range(1L, depth + 1L)
      .select(md5(concat(lit("h"), col("id").cast("string"))).as("block_hash"),
        when(col("id") === 1L, lit("0"))
          .otherwise(md5(concat(lit("h"), (col("id") - 1L).cast("string"))))
          .as("parent_hash"),
        col("id").as("height"))
    val t0 = System.nanoTime()
    val n = ForkWalk.canonicalChain(blocks, maxDepth = depth).count()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(n === depth, "walk must reach genesis")
    // generous CI bound; 17 checkpointed rounds run in ~10s here, while a
    // sequential walk would need 1e5 jobs (>> hours)
    assert(sec < 120.0, f"deep walk took $sec%.1f s — lineage/round blowup?")
  }

  test("g1 query on testdata: one canonical row per height, dense range") {
    val df = q("g1_fork_walk")
    val dup = df.groupBy("height").count().filter(col("count") > 1).count()
    assert(dup === 0L)
    val mm = df.agg(min("height"), max("height"), count(lit(1))).head()
    assert(mm.getLong(2) === mm.getLong(1) - mm.getLong(0) + 1)
  }

  test("branch registry lists every branch with depth and shared root") {
    // g <- a2 <- a3   and   g <- b2 <- b3 <- b4: two tips, one root
    val blocks = tree(
      ("g", "0", 1L),
      ("a2", "g", 2L), ("a3", "a2", 3L),
      ("b2", "g", 2L), ("b3", "b2", 3L), ("b4", "b3", 4L))
    val rows = ForkWalk.branchRegistry(blocks)
      .orderBy(col("tip_hash"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(("a3", 3L, 3L, "g"), ("b4", 4L, 4L, "g")))
  }

  test("branch registry on a single block is that block rooted at itself") {
    val rows = ForkWalk.branchRegistry(tree(("g", "0", 1L))).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "g")
    assert(rows.head.getLong(2) === 1L)
    assert(rows.head.getString(3) === "g")
  }

  test("g2 on testdata: the main chain registers tip-to-window-edge") {
    val df = q("g2_branch_registry")
    assert(df.count() >= 2L) // main tip + side branches
    val hi = Tables.orders(spark, sf).agg(max("o_orderkey")).head().getLong(0)
    val mainTip = md5Hex(s"m$hi")
    val row = df.filter(col("tip_hash") === mainTip).collect()
    assert(row.length === 1)
    assert(row.head.getLong(1) === hi)          // tip height
    assert(row.head.getLong(2) === 1000L)       // full walk window
    assert(row.head.getString(3) === md5Hex(s"m${hi - 999}")) // window edge
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("g3 pagerank: star-graph golden values, hand-computed integer rounds") {
    val sp = spark
    import sp.implicits._
    // K1,3 star, undirected (both directions per edge). Hand arithmetic:
    //   r0: all 1000
    //   round 1: center ← 3·round(1000/1) = 3000 → 150 + round(17·3000/20) = 2700
    //            leaf   ← round(1000/3) = 333    → 150 + round(17·333/20)  = 433
    //   round 2: center ← 3·round(433/1) = 1299  → 150 + round(17·1299/20) = 1254
    //            leaf   ← round(2700/3) = 900    → 150 + round(17·900/20)  = 915
    val half = Seq(("hub", "a"), ("hub", "b"), ("hub", "c")).toDF("u", "v")
    val e = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
    val got = plans.PageRank.ranksOf(e, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("hub" -> 1254L, "a" -> 915L, "b" -> 915L, "c" -> 915L))
  }

  test("g3 on testdata: interior nodes out-rank path endpoints, floor holds") {
    val top = q("g3_pagerank").collect()
    assert(top.length === 50)
    val mm = Tables.customer(spark, sf)
      .agg(min("c_custkey"), max("c_custkey")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // the path's boundary nodes (degree 2 or 3) can never out-rank every
    // degree-4 interior node, so none of them may hold the top rank
    assert(!Set(lo, lo + 1, hi - 1, hi).contains(top.head.getLong(0)))
    assert(top.forall(_.getLong(1) >= 150L)) // damping floor
    val ranks = top.map(_.getLong(1)).toSeq
    assert(ranks === ranks.sorted.reverse)
  }

  test("g4 triangle count matches the chord graph's closed form exactly") {
    val r = q("g4_triangle_count").head()
    val (nodes, edges, tris) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // path-with-chords over N contiguous keys (0- or 1-based): N nodes,
    // 2N−3 edges, one triangle per consecutive triple — exactly N−2
    val n = Tables.customer(spark, sf).count()
    assert(nodes === n)
    assert(edges === 2 * n - 3)
    assert(tris === n - 2)
  }

  test("g5 bfs: golden path graph distances; closed form holds on testdata") {
    val sp = spark
    import sp.implicits._
    // path 1–2–3–4–5, seed {1}: distances 0,1,2,3,4 after 4 rounds
    val half = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val e = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
    val seeds = Seq(1L).toDF("node")
    val got = plans.PageRank.bfsOf(e, seeds, cap = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // with too small a cap, the far node is honestly unreached (null), not wrong
    val short = plans.PageRank.bfsOf(e, seeds, cap = 2).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(short(5L) === -1L && short(3L) === 2L)
    // the cap is a budget: a generous cap exits at eccentricity+1 (the +1
    // is the no-op convergence round), with the same distances
    val (lazyDist, used) = plans.PageRank.bfsOfCounted(e, seeds, cap = 100)
    assert(used === 5)
    assert(lazyDist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === got)
    // testdata: every node reached, distance == ⌈nearest-seed gap / 2⌉
    val out = q("g5_bfs_distance").collect()
    val n = Tables.customer(spark, sf).count()
    assert(out.length === n && out.forall(!_.isNullAt(1)))
    val seedsAll = (1L to n by plans.PageRank.SeedMod).toArray
    out.foreach { r =>
      val (k, dist) = (r.getLong(0), r.getLong(1))
      val gap = seedsAll.map(s => math.abs(k - s)).min
      assert(dist === (gap + 1) / 2, s"node $k")
    }
  }

  test("p2 keeps exactly the suffix above the newest broken link") {
    val kept = q("p2_chain_filter")
    val all = ForkWalk.linkTable(spark, sf)
    // every kept row's height is above the max corrupted height
    val maxCorrupt = all.filter(col("parent_hash") =!=
        md5(concat(lit("m"), (col("height") - 1).cast("string"))))
      .agg(max("height")).head().getLong(0)
    assert(kept.agg(min("height")).head().getLong(0) === maxCorrupt)
    assert(kept.count() ===
      all.agg(max("height")).head().getLong(0) - maxCorrupt + 1)
  }
}
