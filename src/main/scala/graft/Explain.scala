package graft

/** Plan-inspection entry point: for each named registered query, print the
  * formatted physical plan and a timed `count()` against
  * `SPARK_GRAFT_SF_DIR`. The dev loop behind every ".explain until it's the
  * plan you'd want" iteration — Bench times, this one shows WHY.
  *
  * Usage: `tools/run_main.sh graft.Explain j3_commits_join[,more...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq(SparkEntry.queries.keys.head))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"\n===== $n =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"$n: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
