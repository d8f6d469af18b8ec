package graft

/** Dev-only drive of the cache refresh cycle: full refresh, then an
  * incremental refresh from a height threshold; prints per-bucket file
  * listings so partition-level idempotence is observable on disk.
  * Usage: runMain graft.CacheDemo <sfDir> <cacheDir> <fromHeight>
  */
object CacheDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, cacheDir, fromHeight) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "cache-demo")

    def listing(): Map[String, Seq[String]] = {
      val base = new java.io.File(s"$cacheDir/block_info")
      Option(base.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("height_bucket="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"${f.getName}@${f.lastModified}").toSeq.sorted)
        .toMap
    }

    Pipelines.refreshCache(spark, sfDir, cacheDir)
    val before = listing()
    val rowsBefore = spark.read.parquet(s"$cacheDir/block_info").count()
    Thread.sleep(1100)
    Pipelines.refreshBlockInfoIncremental(spark, sfDir, cacheDir, fromHeight.toLong)
    val after = listing()
    val rowsAfter = spark.read.parquet(s"$cacheDir/block_info").count()

    val untouched = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    val rewritten = after.keySet.filter(k => before.get(k) != Some(after(k)))
    println(s"CACHEDEMO rows_before=$rowsBefore rows_after=$rowsAfter " +
      s"untouched=${untouched.toSeq.sorted.mkString(",")} " +
      s"rewritten=${rewritten.toSeq.sorted.mkString(",")}")
    spark.stop()
  }
}
