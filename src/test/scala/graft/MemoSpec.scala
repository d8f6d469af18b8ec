package graft

/** Laws of the shared-core materialization cache (VERDICT r7 item 1): the
  * memo is what keeps composed queries (px5/tx17/TrainingPipeline) from
  * re-running the d2/d6/tx9 cores, so its caching contract needs gates of
  * its own — build-once, mtime invalidation, and per-tag isolation. */
class MemoSpec extends SparkSpec {
  test("cached builds once per (dir, tag, mtime) and serves the same frame") {
    var builds = 0
    def build = {
      builds += 1
      Tables.documents(spark, sf).select("doc_id")
    }
    val a = Memo.cached(spark, sf, "memospec_once", "documents.parquet")(build)
    val b = Memo.cached(spark, sf, "memospec_once", "documents.parquet")(build)
    assert(builds === 1, "second call must serve the memoized core")
    assert(a eq b, "both calls must return the SAME materialized frame")
  }

  test("distinct tags never collide") {
    var builds = 0
    def build = {
      builds += 1
      Tables.documents(spark, sf).select("doc_id")
    }
    Memo.cached(spark, sf, "memospec_tag_a", "documents.parquet")(build)
    Memo.cached(spark, sf, "memospec_tag_b", "documents.parquet")(build)
    assert(builds === 2)
  }

  test("a source mtime change invalidates the entry (stale cores never served)") {
    val dir = java.nio.file.Files.createTempDirectory("memospec").toFile
    val src = new java.io.File(dir, "documents.parquet")
    java.nio.file.Files.writeString(src.toPath, "v1")
    var builds = 0
    def build = {
      builds += 1
      Tables.documents(spark, sf).select("doc_id")
    }
    Memo.cached(spark, dir.getPath, "memospec_mtime", "documents.parquet")(build)
    Memo.cached(spark, dir.getPath, "memospec_mtime", "documents.parquet")(build)
    assert(builds === 1)
    // regenerate the source: same path, different mtime → entry invalid
    assert(src.setLastModified(src.lastModified + 60000L))
    Memo.cached(spark, dir.getPath, "memospec_mtime", "documents.parquet")(build)
    assert(builds === 2, "an mtime change must rebuild, never serve stale")
  }

  /** ADVICE r12 (medium): the parquet scratch path omitted the data DIR,
    * so two dirs sharing a tag and a source mtime (dirs generated or
    * copied together) wrote the SAME path — the second build overwrote the
    * parquet backing the first's still-cached lazy DataFrame. */
  test("cachedParquet: two data dirs, same tag, equal mtimes — each serves its own corpus") {
    val sp = spark
    import sp.implicits._
    val d1 = java.nio.file.Files.createTempDirectory("memopq1").toFile
    val d2 = java.nio.file.Files.createTempDirectory("memopq2").toFile
    Seq(1L).toDF("v").write.parquet(new java.io.File(d1, "documents.parquet").getPath)
    Seq(2L).toDF("v").write.parquet(new java.io.File(d2, "documents.parquet").getPath)
    val t = 1700000000000L
    assert(new java.io.File(d1, "documents.parquet").setLastModified(t))
    assert(new java.io.File(d2, "documents.parquet").setLastModified(t))
    val a = Memo.cachedParquet(spark, d1.getPath, "memospec_pq_dir", "documents.parquet")(
      spark.read.parquet(new java.io.File(d1, "documents.parquet").getPath))
    val b = Memo.cachedParquet(spark, d2.getPath, "memospec_pq_dir", "documents.parquet")(
      spark.read.parquet(new java.io.File(d2, "documents.parquet").getPath))
    assert(b.collect().map(_.getLong(0)).toSeq === Seq(2L))
    // the load-bearing assert: a's LAZY reads after b's build must still
    // see d1's corpus (pre-fix, b's overwrite re-pointed them at d2's)
    assert(a.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  /** ADVICE r12 (low): concurrent first builds of one key both wrote the
    * final path with mode=overwrite — the loser's overwrite raced the
    * winner's readers. Now each build lands in a unique temp dir and an
    * ATOMIC rename picks exactly one; the loser discards its files and
    * adopts the winner's index. A sibling session (same appId → same
    * scratch root, different cache key) exercises the loser branch
    * deterministically. */
  test("cachedParquet: the rename loser adopts the existing index and leaves no temp dirs") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("memopqrace").toFile
    Seq(7L).toDF("v").write.parquet(new java.io.File(dir, "documents.parquet").getPath)
    val winner = Memo.cachedParquet(spark, dir.getPath, "memospec_pq_race",
      "documents.parquet")(
      spark.read.parquet(new java.io.File(dir, "documents.parquet").getPath))
    assert(winner.collect().map(_.getLong(0)).toSeq === Seq(7L))
    val s2 = spark.newSession()
    // the loser's build produces DIFFERENT rows; adopting the winner's
    // index (same (tag, dir, mtime) key ⇒ same logical content) is the
    // contract, so the result must be the winner's corpus
    val loser = Memo.cachedParquet(s2, dir.getPath, "memospec_pq_race",
      "documents.parquet")(Seq(99L).toDF("v"))
    assert(loser.collect().map(_.getLong(0)).toSeq === Seq(7L),
      "the loser must read the winner's landed index, not its own build")
    val scratch = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-memo-${spark.sparkContext.applicationId}")
    val leftovers = Option(scratch.list()).getOrElse(Array.empty[String])
      .filter(n => n.startsWith("memospec_pq_race") && n.contains("_tmp_"))
    assert(leftovers.isEmpty, s"loser temp dirs must be cleaned: ${leftovers.toSeq}")
  }
}
