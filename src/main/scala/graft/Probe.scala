package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for pipeline stages (not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "probe")
    import graft.functions.TextOps._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    GraftExtensions.ensure(spark)
    time("warm")(Tables.lineitem(spark, d).count())
    val docs = Tables.documents(spark, d)
    time("scan")(docs.count())
    time("tokens")(docs.select(toks(col("text")).as("tk")).agg(sum(size(col("tk")))).head().getLong(0))
    time("shingles")(docs.select(shingles(toks(col("text"))).as("sh")).agg(sum(size(col("sh")))).head().getLong(0))
    val withHs = docs.select(col("doc_id"),
      transform(shingles(toks(col("text"))), x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")).as("hs"))
    time("shingle md5+conv")(withHs.agg(sum(size(col("hs")))).head().getLong(0))
    val sig = withHs.select(col("doc_id") +: (0 until 8).map(j =>
      array_min(transform(col("hs"), h => h.bitwiseXOR(lit(1234567L * (j + 1))))).as(s"h$j")): _*)
    time("8 xor-min sigs")(sig.count())
    time("d2 full")(operators.Dedup.queries("d2_minhash_lsh")(spark, d).count())
    spark.stop()
  }
}
