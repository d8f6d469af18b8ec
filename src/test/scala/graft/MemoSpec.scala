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
}
