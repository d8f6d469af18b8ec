package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator (VERDICT r7 item 3).
  *
  * The driver ships testdata up to sf0.1 (~17 MB); every 100 TB claim in
  * SCALE.md is therefore a plan-shape argument until the same plans have
  * actually RUN on bigger inputs. This main replicates sf0.1 by an integer
  * factor F into `target/scaledata/sf<F>x`, preserving the statistical
  * shape a real scale-up would have:
  *
  *   - FACT tables (orders, lineitem, events, documents, embeddings) are
  *     unioned F times with DISJOINT key spaces (copy i offsets every key
  *     column by i·OFFSET, one OFFSET per key domain, each a power of ten
  *     above the sf0.1 max so scaled keys stay readable). lineitem keeps
  *     the SAME offset as orders on l_orderkey, so FK joins fan out
  *     correctly instead of cross-matching copies.
  *   - DIMENSION tables (region, nation, customer, supplier, part) are
  *     copied unchanged — at 100 TB the fact side grows, the dims don't;
  *     per-dim-key join fan-in grows F×, which is exactly the stress a
  *     bigger cluster sees.
  *   - events keep their 30-day wall-clock span (F× the rows PER DAY, with
  *     per-copy user_id offsets so distinct-user state truly grows F×).
  *   - documents get a per-copy suffix token appended to `text` (n_chars
  *     updated to match): copies are NEAR-duplicates of each other, so the
  *     LSH/dedup family faces F·(F−1)/2 genuine cross-copy candidate pairs
  *     per original doc — the adversarial case for banding at scale.
  *   - embeddings perturb component 0 by i·1e-3 — near-identical vectors
  *     that stress ANN cell assignment without degenerate exact ties.
  *
  * Rerun-safe: output dirs are overwritten. Correctness still gates on the
  * driver's own parquet (TESTDATA.md); this derived set exists ONLY for
  * `graft.Bench` scale runs (BENCH_SF1.json).
  *
  * Usage: `sbt "runMain graft.ScaleUp [factor] [outDir]"` (default 10 →
  * ~170 MB ≈ sf1).
  */
object ScaleUp {

  /** Per-domain key offset = exact SOURCE max + 1, DERIVED from the data
    * (one cheap max() agg per key column), never a constant: the r8 form
    * pinned the offsets to the sf0.1 maxima, so running ScaleUp against any
    * other source (the sf1 output to build sf10, regenerated testdata with
    * larger key maxima) silently produced OVERLAPPING key spaces — cross-
    * copy FK joins matched and counts no longer multiplied by F, with no
    * error anywhere (ADVICE r8, medium). Using the exact max keeps the
    * scaled key space CONTIGUOUS, so density-sensitive plans (w5's min→max
    * gap-fill grid, height-bucket widths) see the same fill ratio as the
    * original — a round-power offset would pad each copy with an
    * artificial dead zone and charge the gap-fill family for synthetic
    * heights. */
  private[graft] def keyOff(dfs: Seq[DataFrame], keyCols: Seq[String]): Long =
    dfs.zip(keyCols).map { case (df, c) =>
      val row = df.agg(max(col(c).cast("long"))).head
      // fail with the table/column named, not an opaque NPE from a null
      // max over an empty source (review r9)
      require(!row.isNullAt(0), s"ScaleUp: source has no rows for key '$c' — cannot derive an offset")
      row.getLong(0)
    }.max + 1L

  /** Union F copies of `df`, transforming copy i via `remap(df, i)`.
    * Copy 0 is the identity so the original rows survive verbatim. */
  private def replicate(df: DataFrame, f: Int)(
      remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until f).map(i => remap(df, i)).reduce(_ unionByName _)

  /** orders/lineitem share ONE offset over max(o_orderkey, l_orderkey) so
    * scaled FK joins fan out inside a copy, never across copies. */
  def orderOff(orders: DataFrame, lineitem: DataFrame): Long =
    keyOff(Seq(orders, lineitem), Seq("o_orderkey", "l_orderkey"))

  def scaleOrders(df: DataFrame, f: Int, off: Long): DataFrame =
    replicate(df, f) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
    }

  def scaleLineitem(df: DataFrame, f: Int, off: Long): DataFrame =
    replicate(df, f) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
    }

  /** ZIPF-SKEW remap for rehearsals (VERDICT r8 item 6): disjoint-key
    * replication keeps per-key group sizes CONSTANT, so the salted paths
    * (a15, j16) and the CC/window operators never see skew grow with
    * scale — uniform rehearsals can't exercise them. This deterministic
    * remap sends `hotFrac`/10 of rows to `hotN` hot keys (zipf-ish head:
    * key h gets ~hotFrac/(10·hotN) of ALL rows, ~F× a uniform key's
    * share at factor F), leaving the tail untouched. `seed` columns make
    * the draw row-local and reproducible; the result keeps the original
    * dtype so the scaled schema matches the source. Hot keys 1..hotN stay
    * inside every FK dim domain (suppkey/user ids start at 1). Skew mode
    * is a BENCH distribution, not a correctness surface: it deliberately
    * breaks the distinct-count-multiplies-by-F law for the skewed column
    * (counts by key are what skew MEANS) while keeping row counts and
    * primary-key disjointness intact. */
  private def skewKey(k: Column, dtype: org.apache.spark.sql.types.DataType,
                      hotN: Int, hotFrac: Int, seed: Seq[Column]): Column =
    when(pmod(xxhash64(seed: _*), lit(10L)) < lit(hotFrac.toLong),
      pmod(xxhash64(seed :+ lit(1L): _*), lit(hotN.toLong)) + lit(1L))
      .otherwise(k).cast(dtype)

  /** Skewed variant: l_suppkey (= commits.leader_key_address, the a15/j16
    * aggregation/join key) concentrates 70% of rows on 5 hot suppliers. */
  def scaleLineitemSkewed(df: DataFrame, f: Int, off: Long): DataFrame =
    scaleLineitem(df, f, off)
      .withColumn("l_suppkey", skewKey(col("l_suppkey"),
        df.schema("l_suppkey").dataType, hotN = 5, hotFrac = 7,
        Seq(col("l_orderkey"), col("l_linenumber"))))

  def scaleEvents(df: DataFrame, f: Int): DataFrame = {
    // one aggregation job for both key maxima (review r9: two single-
    // column jobs scanned events twice)
    val row = df.agg(max(col("event_id").cast("long")),
      max(col("user_id").cast("long"))).head
    require(!row.isNullAt(0) && !row.isNullAt(1),
      "ScaleUp: events source has no rows — cannot derive offsets")
    val eventOff = row.getLong(0) + 1L
    val userOff = row.getLong(1) + 1L
    replicate(df, f) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * eventOff))
        .withColumn("user_id", col("user_id") + lit(i * userOff))
    }
  }

  /** Skewed variant: user_id (sessionization/MAU/funnel state key)
    * concentrates 70% of events on 5 hot users. */
  def scaleEventsSkewed(df: DataFrame, f: Int): DataFrame =
    scaleEvents(df, f)
      .withColumn("user_id", skewKey(col("user_id"),
        df.schema("user_id").dataType, hotN = 5, hotFrac = 7,
        Seq(col("event_id"))))

  def scaleDocuments(df: DataFrame, f: Int): DataFrame = {
    val off = keyOff(Seq(df), Seq("doc_id"))
    replicate(df, f) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text", concat(col("text"), lit(s" zc$i")))
        .withColumn("n_chars", length(col("text")))
    }
  }

  def scaleEmbeddings(df: DataFrame, f: Int): DataFrame = {
    val off = keyOff(Seq(df), Seq("vec_id"))
    replicate(df, f) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("vec_id", col("vec_id") + lit(i * off))
        .withColumn("embedding", transform(col("embedding"), (x, idx) =>
          when(idx === 0, x + lit(i * 1e-3f)).otherwise(x)))
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse(s"target/scaledata/sf${factor}x")
    // third arg "zipf" → skewed fact distributions (see skewKey)
    val zipf = args.lift(2).contains("zipf")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-scaleup")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaleup] $name done")
    }

    // dims: verbatim copies
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      write(n, spark.read.parquet(s"$srcDir/$n.parquet"))
    }
    // facts: disjoint-key replication
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val oOff = orderOff(orders, lineitem)
    write("orders", scaleOrders(orders, factor, oOff))
    write("lineitem",
      if (zipf) scaleLineitemSkewed(lineitem, factor, oOff)
      else scaleLineitem(lineitem, factor, oOff))
    write("events",
      if (zipf) scaleEventsSkewed(Tables.events(spark, srcDir), factor)
      else scaleEvents(Tables.events(spark, srcDir), factor))
    write("documents", scaleDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), factor))
    write("embeddings", scaleEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), factor))
    // Skewed dirs are BENCH-ONLY: zipf rewrites l_suppkey/user_id on copy 0
    // too, so the "original rows survive verbatim" law does not hold and
    // pointing Verify or the oracle gate at one produces confusing
    // mismatches. The marker file makes such a dir self-identifying
    // (ADVICE r9).
    if (zipf)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/_SCALEUP_ZIPF"),
        "skewed bench-only dir: copy-0 rows are rewritten, do not oracle-gate\n")
    System.err.println(s"[scaleup] wrote ${factor}x of $srcDir to $outDir" +
      (if (zipf) " (zipf — bench-only)" else ""))
    spark.stop()
  }
}
