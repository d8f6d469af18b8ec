object ExplainTmp extends App {
  val s = graft.Sessions.local("8", "explain-tmp")
  for (n <- Seq("tx9_tfidf_pairs", "d9_incremental_dedup", "px14_span_scrub")) {
    println(s"==== $n")
    val p = graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.1").queryExecution.executedPlan.toString
    // summarize: exchanges + joins + broadcast
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("CartesianProduct")).foreach(l => println(l.trim.take(150)))
  }
  s.stop()
}
