package graft

/** The trained IVF codebook path (x3b): Lloyd's iterations must produce a
  * stable k-cell codebook and must not LOSE recall vs the fixed-cell stub
  * it replaces (float-jitter tolerance of 2 hits — assignments near cell
  * ties can flip in the last ulp). */
class KMeansSpec extends SparkSpec {

  test("codebook is k stable cells of the embedding dimension") {
    val cb = operators.KMeansCodebook.forEmbeddings(spark, sf, 16, 2).collect()
    assert(cb.length === 16)
    assert(cb.map(_.getInt(0)).toSet === (0 until 16).toSet)
    assert(cb.forall(_.getSeq[Double](1).length === 64))
    assert(cb.forall(r => r.getDouble(2) > 0.0)) // no degenerate centroid
  }

  test("trained codebook + nprobe 2 beats or matches the fixed path's recall") {
    val exact = q("x1_knn_bruteforce").select("q_id", "neighbor_id")
    def hits(name: String): Long =
      q(name).select("q_id", "neighbor_id")
        .join(exact, Seq("q_id", "neighbor_id")).count()
    val fixed = hits("x3_ann_ivf")
    val trained = hits("x3b_ann_ivf_trained")
    assert(trained >= fixed, s"trained=$trained fixed=$fixed")
  }
}
