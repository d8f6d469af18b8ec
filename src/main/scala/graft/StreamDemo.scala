package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only end-to-end drives of the streaming stages over file sources
  * with an AvailableNow trigger into parquet sinks.
  * Usage: runMain graft.StreamDemo <sfDir> <workDir> [sessions]
  *  - default: duplicate the documents corpus, stream through
  *    streamingDedup, report counts
  *  - sessions: stream events.parquet through streamingSessions and
  *    compare session counts with the batch w8 aggregation
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    if (args.length > 2 && args(2) == "sessions") return sessionsMain(args)
    val Array(sfDir, workDir) = args.take(2)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "stream-demo")
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val landing = Paths.get(s"$workDir/landing")
    Files.createDirectories(landing)
    // two copies of the same corpus = every document arrives twice
    Seq("a", "b").foreach { tag =>
      Files.copy(Paths.get(s"$sfDir/documents.parquet"),
        landing.resolve(s"docs_$tag.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    // NB: offset event times away from epoch 0 — Spark's initial watermark
    // is 0, so a row with ts == epoch is born late and silently dropped
    val stream = spark.readStream.schema(schema).parquet(landing.toString)
      .withColumn("ts",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))
    val q = streaming.EventStream.streamingDedup(stream)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt")
      .format("parquet")
      .option("path", s"$workDir/deduped")
      .start()
    q.awaitTermination()
    val in = spark.read.parquet(landing.toString).count()
    val out = spark.read.parquet(s"$workDir/deduped").count()
    val distinctTexts = spark.read.parquet(s"$workDir/deduped")
      .select(countDistinct(col("content_hash"))).head().getLong(0)
    println(s"STREAMDEMO input=$in output=$out distinct_hashes=$distinctTexts")
    spark.stop()
  }

  private def sessionsMain(args: Array[String]): Unit = {
    val Array(sfDir, workDir, _) = args.take(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "stream-sessions")
    // the file-stream source needs a directory: land the events file in one
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val landing = Paths.get(s"$workDir/events_landing")
    Files.createDirectories(landing)
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events_0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = streaming.EventStream.fromFiles(spark, landing.toString)
    val q = streaming.EventStream.streamingSessions(stream)
      .writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/_ckpt_sessions")
      .format("parquet")
      .option("path", s"$workDir/sessions")
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$workDir/sessions").count()
    // batch reference: w8's session count on the same events (sessions whose
    // watermark horizon passed; a final-batch stream can't close the very
    // last open session per user, so streamed <= batch <= streamed + users)
    val batch = SparkEntry.queries("w8_sessionize")(spark, sfDir).count()
    val users = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id"))).head().getLong(0)
    println(s"STREAMSESSIONS streamed=$streamed batch=$batch users=$users")
    spark.stop()
  }
}
