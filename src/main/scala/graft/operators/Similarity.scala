package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ops, SURVEY.md
  * §7.5): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * The LSH planes are a fixed ±1 matrix derived from md5 (driver-side,
  * deterministic) and embedded as literals into BOTH the Spark plan and the
  * DuckDB oracle SQL, so the two engines bucket identically. At 100 TB the
  * bucket signature is a map-side expression; the candidate join shuffles
  * on (bucket) instead of comparing all pairs — recall trades against the
  * number of planes (here 4 planes → 16 buckets).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64
  private val NPlanes = 4
  private val TopK = 10

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplanes: component i of plane j is +1 iff the
    * first hex digit of md5("j:i") has its high bit set. */
  private[operators] val planes: Seq[Seq[Double]] =
    (0 until NPlanes).map(j => (0 until Dim).map(i =>
      if (md5hex(s"$j:$i").head >= '8') 1.0 else -1.0))

  /** float[] → double[] as a native array cast (codegen'd; a transform()
    * lambda here would knock the whole stage out of WSCG). */
  private def dvec(c: Column): Column = c.cast("array<double>")

  /** Native codegen'd dot product (expressions.DotProduct). Callers MUST
    * run GraftExtensions.ensure(session) first — [[vecs]] does — or
    * call_function cannot resolve graft_dot (no HOF fallback; the fold
    * order is pinned by the expression so results are IEEE-identical). */
  private[operators] def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** LSH bucket id (row-local): bit j set iff v · plane_j > 0. */
  private def bucket(v: Column): Column =
    (0 until NPlanes).map { j =>
      when(dot(v, typedlit(planes(j))) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Vectors with their norm precomputed once (row-local) — per-candidate
    * work in the knn joins is then a single dot product. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.GraftExtensions.ensure(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), dvec(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

  /** X1 — exact brute-force cosine top-k for query vectors (vec_id < 5):
    * the correctness baseline every ANN variant is judged against. One
    * broadcast of the tiny query side; candidates never shuffle. */
  private val x1: Q = (s, d) => {
    val v = vecs(s, d)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_raw").desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** X2 — LSH-bucketed ANN: queries only compare against candidates in the
    * SAME hyperplane bucket (16 buckets), then exact cosine + top-k within
    * the bucket. The equi-join on bucket is the 100 TB plan shape — O(n/16)
    * candidates per query instead of O(n). */
  private val x2: Q = (s, d) => {
    val v = vecs(s, d).withColumn("bucket", bucket(col("v")))
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_raw").desc, col("vec_id"))
    v.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"), col("bucket"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** X2b — MULTI-PROBE LSH: each query probes its own bucket plus the
    * NPlanes buckets at Hamming distance 1 (flip one plane's bit) — the
    * standard recall lever for hyperplane LSH (single-probe recall@10 is
    * 0.16 here; see x4). Still a bucketed equi-join: the tiny query side
    * explodes ×(NPlanes+1) and broadcasts; candidates never shuffle and
    * each sees ≈(NPlanes+1)/2^NPlanes of the data instead of all of it. */
  private val x2b: Q = (s, d) => {
    val v = vecs(s, d).withColumn("bucket", bucket(col("v")))
    val probes = array(
      col("bucket") +: (0 until NPlanes).map(j =>
        col("bucket").bitwiseXOR(lit(1 << j))): _*)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qnorm"), explode(probes).as("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_raw").desc, col("vec_id"))
    v.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val NCells = 16

  /** X3 — IVF-style ANN: vectors are assigned to the nearest of 16 codebook
    * cells, and queries search ONLY their own cell — the coarse-quantization
    * scale path (Σ O(|cell|·queries-in-cell) instead of O(n) per query).
    * The codebook here is fixed (the 16 lowest vec_ids) so both engines
    * derive identical cells; a production build would k-means it — the
    * plan shape (assign map-side, equi-join on cell, exact re-rank) is the
    * part that carries to 100 TB. */
  /** Shared IVF body over any (cell_id, cv, cnorm) codebook: assign
    * ROW-LOCALLY vs the broadcast codebook, equi-join queries to their
    * `nprobe` nearest cells (the standard IVF recall lever — candidates
    * always live in exactly one cell, so probing N cells never duplicates
    * a pair), exact re-rank inside them.
    *
    * The codebook collapses to ONE broadcast row holding the sorted cell
    * array, so cell assignment is a per-row fold over 16 broadcast structs
    * — no 16× fact expansion, no shuffle, no Window over the vector set
    * (the r3 finding: the old crossJoin + row_number form shuffled and
    * sorted 16n rows keyed by vec_id to compute a row-local argmax).
    * argmax = array_max over (cos, -cell_id) structs — lexicographic
    * struct comparison ≡ ORDER BY cos DESC, cell_id ASC, so the DuckDB
    * oracle's row_number form picks the identical cell. */
  private[operators] def ivfBody(v: DataFrame, cb: DataFrame,
                                 nprobe: Int = 1): DataFrame = {
    // sort_array pins the nondeterministic collect_list order
    val cells = cb.agg(sort_array(collect_list(
      struct(col("cell_id"), col("cv"), col("cnorm")))).as("cells"))
    // scores materialized in their own projection: `best` and the probe
    // slice each reference it once, so the interpreted HOF is evaluated
    // once per row (multi-use refs would re-run all 16 dots per reference)
    val scored = v.crossJoin(broadcast(cells))
      .withColumn("scores", transform(col("cells"), c =>
        struct(
          (dot(col("v"), c.getField("cv")) /
            (col("norm") * c.getField("cnorm"))).as("cos"),
          (-c.getField("cell_id")).as("neg_id"))))
      .drop("cells")
    val assigned = scored
      .withColumn("best", array_max(col("scores")))
      .select(col("vec_id"), col("v"), col("norm"),
        (-col("best.neg_id")).as("cell_id"))
    // queries probe their nprobe best cells: ascending struct sort, take
    // the tail — same total order as the assignment argmax
    val q = scored.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qnorm"),
        explode(slice(array_sort(col("scores")), -nprobe, nprobe)).as("probe"))
      .select(col("q_id"), col("qv"), col("qnorm"),
        (-col("probe.neg_id")).as("cell_id"))
    val wRank = Window.partitionBy("q_id").orderBy(col("cos_raw").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cell_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos_raw",
        dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos_raw"), 4).as("cos"), col("cell_id"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val x3: Q = (s, d) => {
    val v = vecs(s, d)
    val cb = v.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("norm").as("cnorm"))
    ivfBody(v, cb)
  }

  /** X3b — IVF over a TRAINED codebook (KMeansCodebook, 3 Lloyd's
    * iterations) with nprobe=2: k-means buys data-adaptive, balanced cells
    * (bounded per-cell candidate cost on clustered real embeddings; on the
    * isotropic testdata it is recall-neutral) and the second probe is the
    * recall lever. Rows-only at the gate (iterative float training has no
    * tractable SQL mirror); KMeansSpec pins an absolute recall floor. */
  private val x3b: Q = (s, d) =>
    ivfBody(vecs(s, d), KMeansCodebook.forEmbeddings(s, d, NCells, 3), nprobe = 2)

  /** X4 — ANN recall gate (VERDICT r2 item 4): recall@10 of the LSH and
    * IVF paths against the exact kNN baseline, AS A QUERY — the recall the
    * CHANGELOG used to merely claim is now hash-compared per round. All
    * three inputs are deterministic, so the recall is too. Scaled-integer
    * basis points via ExactRatio (engine-portable rounding). */
  private val x4: Q = (s, d) => {
    val exact = x1(s, d).select(col("q_id"), col("neighbor_id"))
    val total = exact.agg(count(lit(1)).as("total"))
    def recallOf(ann: Q, method: String): DataFrame =
      ann(s, d).select(col("q_id"), col("neighbor_id"))
        .join(exact, Seq("q_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(total))
        .select(lit(method).as("method"), col("hits"), col("total"),
          graft.functions.ExactRatio.scaled(col("hits"), col("total"), 10000L)
            .as("recall_bp"))
    recallOf(x3, "ivf")
      .unionByName(recallOf(x2, "lsh"))
      .unionByName(recallOf(x2b, "lsh_mp"))
      .orderBy(col("method"))
  }

  val queries: Map[String, Q] = Map(
    "x1_knn_bruteforce" -> x1,
    "x2_ann_lsh" -> x2,
    "x2b_ann_multiprobe" -> x2b,
    "x3_ann_ivf" -> x3,
    "x3b_ann_ivf_trained" -> x3b,
    "x4_ann_recall" -> x4
  )

  private def planeSql(j: Int): String =
    planes(j).map(p => if (p > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private val dotQSql =
    s"list_sum(list_transform(range($Dim), i -> a.v[i+1] * q.qv[i+1]))"
  private val normSql = "a.norm * q.qnorm"
  private val vNormSql =
    s"sqrt(list_sum(list_transform(range($Dim), i -> v[i+1] * v[i+1])))"
  private val bucketSql = (0 until NPlanes).map { j =>
    s"(CASE WHEN list_sum(list_transform(range($Dim), i -> v[i+1] * (${planeSql(j)})[i+1])) > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  private lazy val x4Sql: String = {
    val scaled = graft.functions.ExactRatio.scaledSql("hits", "total", 10000L)
    s"""WITH e AS (SELECT q_id, neighbor_id FROM (${oraclesBase("x1_knn_bruteforce")})),
       | l AS (SELECT q_id, neighbor_id FROM (${oraclesBase("x2_ann_lsh")})),
       | m AS (SELECT q_id, neighbor_id FROM (${oraclesBase("x2b_ann_multiprobe")})),
       | f AS (SELECT q_id, neighbor_id FROM (${oraclesBase("x3_ann_ivf")})),
       | t AS (SELECT count(*) AS total FROM e),
       | lh AS (SELECT count(*) AS hits FROM l JOIN e USING (q_id, neighbor_id)),
       | mh AS (SELECT count(*) AS hits FROM m JOIN e USING (q_id, neighbor_id)),
       | fh AS (SELECT count(*) AS hits FROM f JOIN e USING (q_id, neighbor_id))
       | SELECT 'ivf' AS method, hits, total, $scaled AS recall_bp FROM fh, t
       | UNION ALL
       | SELECT 'lsh' AS method, hits, total, $scaled AS recall_bp FROM lh, t
       | UNION ALL
       | SELECT 'lsh_mp' AS method, hits, total, $scaled AS recall_bp FROM mh, t
       | ORDER BY method""".stripMargin
  }

  lazy val oracles: Map[String, String] =
    oraclesBase + ("x4_ann_recall" -> x4Sql)

  private lazy val oraclesBase: Map[String, String] = Map(
    "x1_knn_bruteforce" ->
      s"""WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         | v AS (SELECT vec_id, v, $vNormSql AS norm FROM v0),
         | q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm FROM v WHERE vec_id < 5),
         | c AS (SELECT q.q_id, a.vec_id, $dotQSql / ($normSql) AS cos_raw
         |   FROM v a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         | r AS (SELECT q_id, vec_id, cos_raw,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rank FROM c)
         | SELECT q_id, rank, vec_id AS neighbor_id, round(cos_raw, 4) AS cos
         | FROM r WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "x3_ann_ivf" ->
      s"""WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         | v AS (SELECT vec_id, v, $vNormSql AS norm FROM v0),
         | cb AS (SELECT vec_id AS cell_id, v AS cv, norm AS cnorm FROM v WHERE vec_id < $NCells),
         | asg0 AS (SELECT v.vec_id, v.v, v.norm, cb.cell_id,
         |   list_sum(list_transform(range($Dim), i -> v.v[i+1] * cb.cv[i+1])) / (v.norm * cb.cnorm) AS cell_cos
         |   FROM v CROSS JOIN cb),
         | asg AS (SELECT vec_id, v, norm, cell_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cell_cos DESC, cell_id) AS rc FROM asg0) WHERE rc = 1),
         | q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm, cell_id FROM asg WHERE vec_id < 5),
         | c AS (SELECT q.q_id, a.vec_id, a.cell_id, $dotQSql / ($normSql) AS cos_raw
         |   FROM asg a JOIN q ON a.cell_id = q.cell_id WHERE a.vec_id <> q.q_id),
         | r AS (SELECT q_id, vec_id, cell_id, cos_raw,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rank FROM c)
         | SELECT q_id, rank, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, cell_id
         | FROM r WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "x2_ann_lsh" ->
      s"""WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         | v AS (SELECT vec_id, v, $vNormSql AS norm, $bucketSql AS bucket FROM v0),
         | q AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm, bucket FROM v WHERE vec_id < 5),
         | c AS (SELECT q.q_id, a.vec_id, a.bucket, $dotQSql / ($normSql) AS cos_raw
         |   FROM v a JOIN q ON a.bucket = q.bucket WHERE a.vec_id <> q.q_id),
         | r AS (SELECT q_id, vec_id, bucket, cos_raw,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rank FROM c)
         | SELECT q_id, rank, vec_id AS neighbor_id, round(cos_raw, 4) AS cos, bucket
         | FROM r WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "x2b_ann_multiprobe" ->
      s"""WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         | v AS (SELECT vec_id, v, $vNormSql AS norm, $bucketSql AS bucket FROM v0),
         | q0 AS (SELECT vec_id AS q_id, v AS qv, norm AS qnorm, bucket FROM v WHERE vec_id < 5),
         | q AS (SELECT q_id, qv, qnorm, p.probe AS bucket FROM q0,
         |   UNNEST([bucket, ${(0 until NPlanes).map(j => s"xor(bucket, ${1 << j})").mkString(", ")}]) AS p(probe)),
         | c AS (SELECT q.q_id, a.vec_id, $dotQSql / ($normSql) AS cos_raw
         |   FROM v a JOIN q ON a.bucket = q.bucket WHERE a.vec_id <> q.q_id),
         | r AS (SELECT q_id, vec_id, cos_raw,
         |   row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rank FROM c)
         | SELECT q_id, rank, vec_id AS neighbor_id, round(cos_raw, 4) AS cos
         | FROM r WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
  )
}
