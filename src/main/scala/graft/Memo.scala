package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization cache for SHARED QUERY CORES — the
  * relations several registered queries are composed from (d6's cluster
  * labels, the d2 LSH candidate pairs, tx9's scored TF-IDF pairs). Without
  * it, every composing query re-runs the core's shuffles: tx17 paid tx9's
  * whole candidate join again (1.9 s at sf0.1), and d2/d4/d10/d6 each
  * re-ran the signature + band self-join (~1.2 s × 3 redundant runs).
  *
  * Entries are localCheckpoint(true)-materialized DataFrames keyed by
  * (session, data dir, core tag, SOURCE MTIME): regenerating the source
  * parquet at the same path invalidates the entry instead of serving stale
  * results (the KMeansCodebook fingerprint contract), and entries of
  * stopped sessions are purged on access — their checkpoint RDDs die with
  * the session, and the map must not pin dead sessions in a long-lived JVM
  * (the Dedup.clusterCache contract, ADVICE r3, now shared here).
  *
  * At 100 TB this is exactly the "materialize the candidate-pair /
  * cluster-label intermediate once" step a real pipeline persists to
  * storage between stages; in-session localCheckpoint is the single-JVM
  * equivalent (MEMORY_AND_DISK, spills instead of OOM-ing).
  */
object Memo {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, Long), DataFrame]()

  /** Wall-clock of every core build this JVM has run, drained by Bench:
    * memoization made per-query bench attribution ORDER-DEPENDENT (the
    * first query touching a shared core paid its build — d10 0.18 s vs
    * d2 0.06 s in BENCH_r08 only because d10 sorts first), so Bench now
    * subtracts in-query build time from the enclosing query and emits each
    * build as its own `memo:<tag>` line item (VERDICT r8 item 3). Builds
    * outside Bench (Verify, specs) accumulate harmlessly until drained. */
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  /** Record a core build (also used by KMeansCodebook's training, which is
    * the same build-once-compose-many shape outside this cache). */
  def logBuild(tag: String, sec: Double): Unit = buildLog.add((tag, sec))

  /** Per-thread stack of in-progress build frames; each frame accumulates
    * the wall-clock of its DIRECT child builds so a parent logs only its
    * EXCLUSIVE time. Cores compose (cell_asg builds on the k-means
    * training core), and logging inclusive spans double-counted the
    * nested child — Bench's per-query subtraction then drove a query's
    * net time NEGATIVE, which the -1 failure sentinel misread as a crash
    * (caught live in the first r9 smoke run). */
  private val frames = new ThreadLocal[java.util.ArrayDeque[Array[Double]]] {
    override def initialValue() = new java.util.ArrayDeque[Array[Double]]()
  }

  /** Time `f` as the build of `tag`, logging EXCLUSIVE seconds (total
    * minus nested timedBuild spans on this thread). */
  def timedBuild[T](tag: String)(f: => T): T = {
    val stack = frames.get()
    stack.push(Array(0.0))
    val t0 = System.nanoTime()
    var ok = false
    try { val r = f; ok = true; r } finally {
      val total = (System.nanoTime() - t0) / 1e9
      val child = stack.pop()(0)
      // a build that THREW is not a completed core: logging its partial
      // wall would inflate memo line items with time for work that will
      // re-run (and re-log) on the next consumer — the crash stays inside
      // the enclosing query's failure handling (review r9). For the same
      // reason the aborted child's span must NOT be subtracted from the
      // parent's exclusive time: a parent that catches the crash and
      // recovers did the recovery work itself, and the child logged
      // nothing to balance the subtraction (ADVICE r9).
      if (ok) {
        if (!stack.isEmpty) stack.peek()(0) += total
        logBuild(tag, math.max(0.0, total - child))
      }
    }
  }

  /** Remove and return all builds logged since the last drain. */
  def drainBuilds(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var e = buildLog.poll()
    while (e != null) { out += e; e = buildLog.poll() }
    out.toSeq
  }

  /** The memoized core: `build` runs (and is eagerly materialized) only on
    * the first call per (session, dir, tag, source-mtime). `srcFile` names
    * the parquet the core derives from, relative to `dir`.
    *
    * get/putIfAbsent rather than computeIfAbsent: cores COMPOSE (the LSH
    * pair core builds on the hashed-shingle core), so `build` may re-enter
    * this cache for a different tag — a nested computeIfAbsent on the same
    * ConcurrentHashMap throws "Recursive update". The benign race (two
    * threads both building, loser's checkpoint dropped) is acceptable:
    * Bench/Verify run queries sequentially, and correctness is unaffected. */
  def cached(s: SparkSession, dir: String, tag: String, srcFile: String)(
      build: => DataFrame): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val fp = new java.io.File(s"$dir/$srcFile").lastModified
    val key = (s, dir, tag, fp)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val built = timedBuild(tag)(build.localCheckpoint(true))
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  /** [[cached]] for INDEX-SIZED cores: materialize as compressed parquet
    * in a session-scoped scratch dir instead of a serialized RDD
    * checkpoint. A localCheckpoint stores deserialized-then-serialized
    * rows with no columnar encoding — the sf100 trigram postings
    * (~1.5 B (gram, doc_id) rows) ENOSPC'd the box at ~30 GB where
    * parquet's dictionary + RLE holds the same relation in a few GB —
    * and parquet IS the artifact a production build persists anyway (the
    * bucketed-layout story BucketingSpec drives). Session-scoped path,
    * so staleness across code changes is impossible (same lifetime as a
    * checkpoint); same (session, dir, tag, mtime) keying, same build
    * attribution. */
  def cachedParquet(s: SparkSession, dir: String, tag: String,
                    srcFile: String)(build: => DataFrame): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val fp = new java.io.File(s"$dir/$srcFile").lastModified
    val key = (s, dir, tag, fp)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val built = timedBuild(tag) {
        // The scratch path carries EVERY cache-key component that varies
        // within a session: tag, DATA DIR (hashed — two scale dirs used in
        // one session share tags, and dirs generated together share
        // mtimes; omitting the dir made the second build overwrite the
        // parquet backing the first's still-cached DataFrame, ADVICE r12),
        // and source mtime.
        val dirHash = java.lang.Integer.toHexString(dir.hashCode)
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft-memo-${s.sparkContext.applicationId}",
          s"${tag}_${dirHash}_$fp")
        // Build into a unique temp dir and atomically rename: two threads
        // racing the first call would otherwise both write THE SAME final
        // path with mode=overwrite, and the loser's overwrite races the
        // winner's readers (ADVICE r12 — computeIfAbsent is not an option
        // here, cores compose and re-enter this map). rename(2) of a
        // directory fails if the target exists, so exactly one build
        // lands; the loser discards its files and reads the winner's.
        val tmp = java.nio.file.Paths.get(
          path.toString + "_tmp_" + java.util.UUID.randomUUID().toString)
        build.write.mode("overwrite").parquet(tmp.toString)
        try java.nio.file.Files.move(tmp, path,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case e: java.nio.file.FileSystemException =>
            // rename refused. If the target exists we lost the race (or a
            // prior run of this app left it) — it is a COMPLETE index for
            // this exact (tag, dirHash, mtime) key, so drop ours and read
            // theirs; anything else is a real failure and must surface.
            if (!java.nio.file.Files.exists(path)) throw e
            deleteRecursively(tmp.toFile)
        }
        s.read.parquet(path.toString)
      }
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
