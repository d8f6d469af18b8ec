package graft

import org.apache.spark.sql.SparkSession

/** Single place to build/configure the engine's SparkSession so every entry
  * point (Verify, Bench, tests) runs with identical session state — no
  * accessor-level conf mutation (ADVICE r1: order-dependent global state).
  */
object Sessions {

  /** Confs the engine requires beyond Spark defaults. */
  val engineConfs: Map[String, String] = Map(
    // events.parquet carries TIMESTAMP(NANOS); the vectorized reader rejects
    // it unless nanos are surfaced as long (Tables.events converts to µs).
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC"
  )

  /** local[N] session for driver-run mains; shuffle partitions = cores per
    * the driver contract (local mode — a real cluster would size these to
    * 2-3× total executor cores). */
  def local(cpus: String, appName: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    engineConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
