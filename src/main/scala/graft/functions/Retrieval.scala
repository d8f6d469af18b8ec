package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the `documents` table — the query side of a
  * training-data pipeline (find the documents most relevant to a probe
  * query: dataset exploration, targeted decontamination, eval-set mining).
  *
  * TX8 is BM25 with a RATIONAL idf: idf = (2(N−df)+1)/(2df+1), i.e. the
  * classic (N−df+0.5)/(df+0.5) with the logarithm dropped so every factor
  * stays an integer rational and the score is EXACT on both engines
  * (ExactRatio doctrine — round(double) of rationals flips on half
  * boundaries across engines, and ln() is only ever approximately equal).
  * The ln is a monotone per-term reweighting: rankings for single-term
  * queries are identical, multi-term sums weight rare terms more than
  * textbook BM25 — documented, deterministic, and portable. k1 = 1.2,
  * b = 0.75 enter as the exact rationals 6/5 and 3/4.
  *
  * Scale shape: the postings explode filters to the query terms BEFORE the
  * shuffle (predicate on the generated column rides the explode), so the
  * one aggregation shuffle carries |query-term postings| rows, never the
  * corpus; corpus stats (N, ΣT) and per-term document frequencies are
  * broadcast scalars. This is inverted-index retrieval expressed as a
  * DataFrame plan — at 100 TB the only wide stage is a groupBy over the
  * matched postings.
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame
  import TextOps.toksSql

  /** Default probe query (common terms — every one in ~90% of docs). */
  private[graft] val QueryTerms = Seq("spark", "window", "merge")

  /** Rare-skewed probe: "dup" appears in <1% of documents, so its idf
    * factor dominates — the parameterization that exercises the
    * rare-term ranking path (p3/w7 convention: two gated instantiations
    * per parameterizable operator). */
  private[graft] val RareTerms = Seq("dup", "batch", "row")
  private val TopDocs = 20

  /** Per-term milli score, rounded half-up per term then summed — the sum
    * of exact rationals has no bounded common denominator, so the portable
    * form rounds each term identically on both engines first. The query
    * terms are a REAL parameter (the route-argument convention): the
    * in-collection filter is built per call, so any probe query reuses the
    * same single-shuffle postings plan. */
  def bm25(queryTerms: Seq[String]): Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.toks(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_tokens"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // score = idf · tf·(k1+1)/(tf + k1(1−b) + k1·b·dl/avgdl) with
    // avgdl = T/N; multiplying through by 10T makes every factor integer:
    //   num = (2(N−df)+1) · 22·tf·T
    //   den = (2df+1) · (10·tf·T + 3T + 9·dl·N)
    // Caller factors stay in int64 (ANSI raises loudly past ~10^18 —
    // ExactRatio's documented contract); at that corpus size reduce T, N
    // by their gcd upstream.
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("score_milli", ExactRatio.scaled(
        (lit(2L) * (col("n_docs") - col("df")) + lit(1L)) *
          lit(22L) * col("tf") * col("t_tokens"),
        (lit(2L) * col("df") + lit(1L)) *
          (lit(10L) * col("tf") * col("t_tokens") +
            lit(3L) * col("t_tokens") + lit(9L) * col("dl") * col("n_docs")),
        1000L))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("score_milli")).as("bm25_milli"))
      .orderBy(col("bm25_milli").desc, col("doc_id"))
      .limit(TopDocs)
  }

  val queries: Map[String, Q] = Map(
    "tx8_bm25" -> bm25(QueryTerms),
    "tx8_bm25_rare" -> bm25(RareTerms))

  def bm25Sql(queryTerms: Seq[String]): String = {
    val termsSql = queryTerms.map(t => s"'$t'").mkString(", ")
    val num = "(2 * (n_docs - df) + 1) * 22 * tf * t_tokens"
    val den = "(2 * df + 1) * (10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs)"
    s"""WITH tk0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
         | docs AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS dl FROM tk0),
         | stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(sum(dl) AS BIGINT) AS t_tokens FROM docs),
         | posts AS (SELECT doc_id, dl, t.term FROM docs, UNNEST(tk) AS t(term)
         |   WHERE t.term IN ($termsSql)),
         | tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
         |   FROM posts GROUP BY 1, 2, 3),
         | dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         | sc AS (SELECT doc_id,
         |     ${ExactRatio.scaledSql(num, den, 1000L)} AS score_milli
         |   FROM tf JOIN dfreq USING (term), stats)
         | SELECT doc_id, count(*) AS n_terms,
         |   CAST(sum(score_milli) AS BIGINT) AS bm25_milli
         | FROM sc GROUP BY 1
         | ORDER BY bm25_milli DESC, doc_id LIMIT $TopDocs""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "tx8_bm25" -> bm25Sql(QueryTerms),
    "tx8_bm25_rare" -> bm25Sql(RareTerms))
}
