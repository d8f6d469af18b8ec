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
    // deterministic default (sorted first key — the registry map is
    // unordered); unknown names fail with usage, naming the env-var way to
    // set the data dir — arg0 used to BE the dir, and an old-style
    // `Explain /root/testdata/sf0.1` invocation must say what changed
    // instead of throwing NoSuchElementException (ADVICE r8)
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq(SparkEntry.queries.keys.min))
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(
        s"""Unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}
           |Usage: tools/run_main.sh graft.Explain <query>[,<query>...]
           |  (data dir via SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01 —
           |   arg0 is a query list, no longer the dir)
           |Registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}""".stripMargin)
      spark.stop()
      sys.exit(2)
    }
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
