package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Above-gate-scale STREAMING rehearsal (VERDICT r10 item 7): drive the
  * serving loops — `dedupIngest`, `leaderboardRefresh`, `sketchRefresh` —
  * and the watermark-stateful `hourlyAgg` against a scaled corpus arriving
  * in bounded micro-batches, and print PER-TRIGGER input rows, trigger
  * wall, and state size (stateOperators.numRowsTotal for the stateful
  * operator; store/index rows for the foreachBatch merge loops, whose
  * state lives in their versioned directories, not the state store).
  *
  * The batch side has three decades of scale evidence (SCALE.md); this is
  * the streaming side's equivalent: the bound that matters is that
  * per-trigger work tracks the TRIGGER'S data and per-loop state tracks
  * its own geometry (miners / days / 4 band rows per doc), never the
  * processed history.
  *
  * Usage: runMain graft.StreamRehearsal <sfDir> <workDir> [chunks]
  * (workDir must be fresh — checkpoints remember offsets). */
object StreamRehearsal {
  private val Chunks = 8

  /** Land `df` into `dir` as k single-file chunks split by ascending
    * `orderCol` ranges, mtimes ascending — the file source processes
    * oldest-first, so triggers arrive in key order (dedupIngest's
    * nondecreasing-id precondition; watermark monotonicity for events). */
  private def landChunks(df: DataFrame, orderCol: String, k: Int,
                         dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    // normalize the order key to a long: a timestamp column (the
    // ScaleUp-written events) becomes epoch seconds (NTZ must hop through
    // TIMESTAMP — Spark 4 refuses a direct NTZ→BIGINT cast), raw
    // nanos-long and id columns pass through
    val ord = df.schema(orderCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(orderCol).cast("timestamp").cast("long")
      case _ => col(orderCol).cast("long")
    }
    val mm = df.agg(min(ord), max(ord)).head()
    require(!mm.isNullAt(0) && !mm.isNullAt(1),
      s"landChunks: source frame is empty (no $orderCol range) — " +
        "cannot stage an empty table into chunks")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val step = math.max(1L, (hi - lo) / k + 1L)
    java.nio.file.Files.createDirectories(dir)
    val base = System.currentTimeMillis() - k * 2000L
    val tmp = dir.resolveSibling(s"${dir.getFileName}_tmp")
    (0 until k).foreach { i =>
      val a = lo + i * step; val b = lo + (i + 1) * step
      df.filter(ord >= a && ord < b)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file for chunk $i"))
        finally listing.close()
      val target = dir.resolve(f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      target.toFile.setLastModified(base + i * 1000L)
    }
    // staging debris (_SUCCESS/.crc) must not linger next to the real dirs
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(tmp.toFile)
  }

  /** One bounded-micro-batch file stream over a landed chunk dir. */
  private def chunkStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(s.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)

  /** Per-trigger progress report — the rehearsal's measurement. */
  private def report(tag: String, q: StreamingQuery): Unit =
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum)
        .getOrElse(0L)
      println(f"[$tag] batch ${p.batchId}%3d  in ${p.numInputRows}%9d rows  " +
        f"trigger ${p.durationMs.get("triggerExecution") / 1e3}%7.1f s  " +
        f"stateRows $stateRows%9d")
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val k = args.lift(2).map(_.toInt).getOrElse(Chunks)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"), "stream-rehearsal")
    val wd = java.nio.file.Paths.get(workDir)
    // enforce freshness LOUDLY: a reused workDir's checkpoints remember
    // the chunk paths as already-seen, so every trigger would process 0
    // rows while the TOTAL lines read the PREVIOUS run's stores — a no-op
    // rehearsal indistinguishable from a successful one (review r11)
    require(!java.nio.file.Files.exists(wd) ||
      { val l = java.nio.file.Files.list(wd); try !l.iterator().hasNext finally l.close() },
      s"workDir $workDir is not fresh — checkpoints would replay as no-ops")

    // ---- 1. dedupIngest: documents in doc_id-ordered micro-batches ----
    val docsLanding = wd.resolve("docs_landing")
    landChunks(spark.read.parquet(s"$sfDir/documents.parquet"),
      "doc_id", k, docsLanding)
    val q1 = streaming.EventStream.dedupIngest(
      chunkStream(spark, docsLanding.toString),
      s"$workDir/dedup_state", s"$workDir/accepted",
      s"$workDir/_ckpt_dedup", Trigger.AvailableNow())
    q1.awaitTermination()
    report("dedupIngest", q1)
    // state growth = 4 band rows per admitted doc, per trigger
    spark.read.parquet(s"$workDir/dedup_state")
      .groupBy(col("b")).agg(count(lit(1)).as("band_rows"))
      .orderBy(col("b")).collect()
      .foreach(r => println(s"[dedupIngest] state b=${r.get(0)} +${r.getLong(1)} band rows"))
    val idx = spark.read.parquet(s"$workDir/dedup_state").count()
    val acc = spark.read.parquet(s"$workDir/accepted").count()
    val docsN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    println(s"[dedupIngest] TOTAL docs=$docsN accepted=$acc index_rows=$idx (= 4*docs)")

    // ---- 2. leaderboardRefresh: commits in micro-batches ----
    val cmLanding = wd.resolve("commits_landing")
    landChunks(Domain.commits(spark, sfDir), "stacks_block_height", k, cmLanding)
    val q2 = streaming.EventStream.leaderboardRefresh(
      chunkStream(spark, cmLanding.toString),
      s"$workDir/lb_store", s"$workDir/_ckpt_lb", Trigger.AvailableNow())
    q2.awaitTermination()
    report("leaderboard", q2)
    val lb = streaming.EventStream.currentLeaderboard(spark, s"$workDir/lb_store")
    println(s"[leaderboard] TOTAL store rows=${lb.count()} (= distinct miners), " +
      s"mined=${lb.agg(sum(col("total_mined"))).head().getLong(0)} " +
      s"(= ${Domain.commits(spark, sfDir).count()} commits)")

    // ---- 3. sketchRefresh: events in ts-ordered micro-batches ----
    val evLanding = wd.resolve("events_landing")
    landChunks(spark.read.parquet(s"$sfDir/events.parquet"), "ts", k, evLanding)
    def eventsStream(): DataFrame = {
      val raw = chunkStream(spark, evLanding.toString)
      // raw testdata surfaces ts as nanos-long (session conf); ScaleUp
      // output is TIMESTAMP_NTZ — either way normalize to TIMESTAMP
      // (watermarks reject NTZ event time)
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            expr("cast(timestamp_micros(ts div 1000) as timestamp)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    }
    val q3 = streaming.EventStream.sketchRefresh(eventsStream(),
      s"$workDir/sk_store", s"$workDir/_ckpt_sk", Trigger.AvailableNow())
    q3.awaitTermination()
    report("sketch", q3)
    val sk = streaming.EventStream.currentSketches(spark, s"$workDir/sk_store")
    println(s"[sketch] TOTAL store rows=${sk.count()} (= distinct days)")

    // ---- 4. hourlyAgg: the watermark-stateful operator proper ----
    val q4 = streaming.EventStream.hourlyAgg(eventsStream())
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_hourly")
      .format("parquet").option("path", s"$workDir/hourly")
      .start()
    q4.awaitTermination()
    report("hourlyAgg", q4)
    val hours = spark.read.parquet(s"$workDir/hourly").count()
    println(s"[hourlyAgg] TOTAL closed windows=$hours")

    // ---- 5. sessionizer: custom flatMapGroupsWithState loop -----------
    // documented bound: state rows = users with an OPEN session; idle
    // users age out on event-time timeout (gap past the watermark), so
    // state tracks concurrent activity, never accumulated history
    val q5 = streaming.EventStream.streamingSessions(eventsStream())
      .toDF.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_sess")
      .format("parquet").option("path", s"$workDir/sessions")
      .start()
    q5.awaitTermination()
    report("sessions", q5)
    val sess = spark.read.parquet(s"$workDir/sessions")
    val users = spark.read.parquet(evLanding.toString)
      .select(col("user_id")).distinct().count()
    println(s"[sessions] TOTAL closed sessions=${sess.count()} " +
      s"distinct users=$users (state ≤ users with an open session)")

    // ---- 6. stream-stream interval join (attribution) -----------------
    // documented bound: each side buffers only rows the other side's
    // watermark can still reach — rate × 1 h horizon, independent of
    // stream length
    val q6 = streaming.EventStream.streamAttribution(eventsStream())
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_attr")
      .format("parquet").option("path", s"$workDir/attributed")
      .start()
    q6.awaitTermination()
    report("attribution", q6)
    println(s"[attribution] TOTAL attributed pairs=" +
      s"${spark.read.parquet(s"$workDir/attributed").count()}")

    // ---- 7. trailing-hour features: per-second totals state -----------
    // documented bound: per-user seconds within the trailing horizon
    // (rate × horizon); watermark prunes seconds no future event sees
    val q7 = streaming.EventStream.streamingTrailingHour(eventsStream())
      .toDF.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_trail")
      .format("parquet").option("path", s"$workDir/trailing")
      .start()
    q7.awaitTermination()
    report("trailingHour", q7)
    val evsN = spark.read.parquet(evLanding.toString).count()
    println(s"[trailingHour] TOTAL feature rows=" +
      s"${spark.read.parquet(s"$workDir/trailing").count()} (events=$evsN)")

    // ---- 8. heavy hitters: space-saving counters, cap-bounded state ----
    // documented bound: buckets × cap counters FOREVER, independent of
    // stream length; total counter mass == items seen (the space-saving
    // conservation law, checked here on the final store)
    val q8 = streaming.EventStream.streamingHeavyHitters(eventsStream())
      .toDF.writeStream.outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_hh")
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$workDir/hh/batch=$id")
      }
      .start()
    q8.awaitTermination()
    report("heavyHitters", q8)
    // final counters per bucket = its row in the LAST batch that touched it
    val hh = spark.read.option("basePath", s"$workDir/hh")
      .parquet(s"$workDir/hh/batch=*")
    val lastPer = hh.groupBy(col("bucket"))
      .agg(max(col("batch")).as("batch"))
    val finalHh = hh.join(lastPer, Seq("bucket", "batch"))
    val mass = finalHh
      .select(explode(col("counts")).as("c")).agg(sum(col("c"))).head().getLong(0)
    val maxCounters = finalHh
      .select(size(col("counts")).as("n")).agg(max(col("n"))).head().getInt(0)
    println(s"[heavyHitters] TOTAL counter mass=$mass (events=$evsN) " +
      s"buckets=${finalHh.count()} maxCountersPerBucket=$maxCounters (cap=32)")
    spark.stop()
  }
}
