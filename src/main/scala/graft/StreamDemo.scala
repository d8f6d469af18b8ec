package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only end-to-end drive of the streaming dedup stage: duplicate the
  * documents corpus into a landing dir, stream it through streamingDedup
  * with an AvailableNow trigger into a parquet sink, report counts.
  * Usage: runMain graft.StreamDemo <sfDir> <workDir>
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args
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
}
