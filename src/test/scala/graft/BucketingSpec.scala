package graft

import org.apache.spark.sql.functions._

/** §7.6 — bucketing: pre-partitioned tables make the fact⋈dim join plan
  * WITHOUT a shuffle exchange. At 100 TB this is the difference between
  * re-shuffling the fact table per join and reading co-located buckets. */
class BucketingSpec extends SparkSpec {
  test("bucketed co-located join has no shuffle exchange on either side") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    s.sql("DROP TABLE IF EXISTS b_orders")
    // the in-memory catalog forgets tables between JVMs but leaves their
    // warehouse directories behind — clear them or CTAS refuses the location
    Seq("b_lineitem", "b_orders").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(s, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables.orders(s, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_totalprice"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected a shuffle-free bucketed join, got:\n$plan")
    // and it still computes the right thing
    assert(joined.count() === Tables.lineitem(s, sf).count())
  }

  test("d9 state bucketed by (band_idx, bh): ingest join never shuffles the index") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_bands")
    val whDir = new java.io.File("spark-warehouse/b_bands")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(whDir)
    }
    val docs = Tables.documents(s, sf)
    val hist = docs.filter(col("doc_id") < 340)
    val batch = docs.filter(col("doc_id") >= 340)
    operators.Dedup.bandSignatures(hist).write
      .bucketBy(8, "band_idx", "bh").sortBy("band_idx", "bh")
      .mode("overwrite").saveAsTable("b_bands")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bb = operators.Dedup.bandSignatures(batch)
      val rej = operators.Dedup.collisions(s.table("b_bands"), bb)
      val plan = rej.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"state side did not use the bucketed layout:\n$plan")
      val nEx = "Exchange hashpartitioning\\(band_idx".r.findAllIn(plan).length
      assert(nEx === 1,
        s"expected exactly one (band_idx, bh) shuffle — the batch side:\n$plan")
      // and the bucketed layout computes the same collision set
      val plainRej = operators.Dedup.collisions(
        operators.Dedup.bandSignatures(hist), bb)
      assert(rej.distinct().orderBy("doc_id").collect().toSeq ===
        plainRej.distinct().orderBy("doc_id").collect().toSeq)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("tx16c postings bucketed by gram: probe prunes buckets, one doc-grain shuffle") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_postings")
    val whDir = new java.io.File("spark-warehouse/b_postings")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(whDir)
    }
    functions.Retrieval.trigramPostings(Tables.documents(s, sf)).write
      .bucketBy(8, "gram").sortBy("gram")
      .mode("overwrite").saveAsTable("b_postings")
    // the probe aggregates on doc_id, so the planner's "no interesting
    // partitioning downstream" heuristic would DISABLE the bucketed scan —
    // losing the bucket PRUNING the layout exists for; a production probe
    // pins this off exactly like this (autoBucketedScan trades pruning
    // away, which is the wrong trade for a selective index probe)
    val prevAuto = s.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = functions.Retrieval.substringSearchPostings(
        s.table("b_postings"), Tables.documents(s, sf),
        functions.Retrieval.Needle)
      val plan = probe.queryExecution.executedPlan.toString
      // the gram filter reads bucket slices of the index, never all of it
      assert(plan.contains("SelectedBucketsCount"),
        s"probe did not use the bucketed layout:\n$plan")
      // the only hash exchange is the doc-grain candidate count (over the
      // probed lists); the index itself is never reshuffled
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nEx === 1, s"expected exactly one doc-grain shuffle:\n$plan")
      assert("Exchange hashpartitioning\\(gram".r.findAllIn(plan).isEmpty,
        s"the postings index was reshuffled on gram:\n$plan")
      // and the bucketed probe computes the fused answer
      val fused = functions.Retrieval.substringSearch(
        Tables.documents(s, sf), functions.Retrieval.Needle, Some(sf))
      assert(probe.except(fused).isEmpty && fused.except(probe).isEmpty)
    } finally s.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }

  test("tx8c BM25 postings bucketed by term: probe prunes buckets, one doc-grain shuffle") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_bm25_postings")
    val whDir = new java.io.File("spark-warehouse/b_bm25_postings")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(whDir)
    }
    functions.Retrieval.bm25TermPostings(Tables.documents(s, sf)).write
      .bucketBy(8, "term").sortBy("term")
      .mode("overwrite").saveAsTable("b_bm25_postings")
    val prevAuto = s.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = functions.Retrieval.bm25Probe(
        s.table("b_bm25_postings"),
        functions.Retrieval.docLengths(Tables.documents(s, sf)),
        functions.Retrieval.QueryTerms)
      val plan = probe.queryExecution.executedPlan.toString
      // the term filter reads bucket slices of the index, never all of it
      assert(plan.contains("SelectedBucketsCount"),
        s"probe did not use the bucketed layout:\n$plan")
      // the bucket layout satisfies the df count's term-grain clustering,
      // so the only hash exchange is the doc-grain score rollup over the
      // probed lists; the index itself is never reshuffled on term
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nEx === 1, s"expected exactly one doc-grain shuffle:\n$plan")
      assert("Exchange hashpartitioning\\(term".r.findAllIn(plan).isEmpty,
        s"the postings index was reshuffled on term:\n$plan")
      // and the bucketed probe computes the fused answer, order included
      val fused = functions.Retrieval
        .bm25(functions.Retrieval.QueryTerms)(s, sf)
      assert(probe.collect().toSeq === fused.collect().toSeq)
    } finally s.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }

  test("tx13c positional postings bucketed by tok: probe prunes buckets, keyed shuffles only") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_pos_postings")
    val whDir = new java.io.File("spark-warehouse/b_pos_postings")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(whDir)
    }
    functions.TextQueries.positionalPostings(Tables.documents(s, sf)).write
      .bucketBy(8, "tok").sortBy("tok")
      .mode("overwrite").saveAsTable("b_pos_postings")
    val prevAuto = s.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = functions.TextQueries.phraseSearchPostings(
        s.table("b_pos_postings"), functions.TextQueries.Phrase2)
      val plan = probe.queryExecution.executedPlan.toString
      // the term filter reads bucket slices of the index, never all of it
      assert(plan.contains("SelectedBucketsCount"),
        s"probe did not use the bucketed layout:\n$plan")
      // the only hash exchanges are the anchor-vote count and the
      // doc-grain rollup; the index itself is never reshuffled on tok
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nEx === 2, s"expected the two keyed shuffles only:\n$plan")
      assert("Exchange hashpartitioning\\(tok".r.findAllIn(plan).isEmpty,
        s"the postings index was reshuffled on tok:\n$plan")
      // and the bucketed probe computes the fused answer
      val fused = functions.TextQueries.phraseSearch(
        Tables.documents(s, sf), functions.TextQueries.Phrase2)
      assert(probe.except(fused).isEmpty && fused.except(probe).isEmpty)
    } finally s.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }

  test("the same join on raw parquet DOES shuffle (control)") {
    val s = spark
    val joined = Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
    // disable AQE-broadcast interference by checking the initial plan string
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange") || plan.contains("Broadcast"),
      s"control join unexpectedly shuffle-free:\n$plan")
  }
}
