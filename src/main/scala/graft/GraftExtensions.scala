package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.expressions.{BandedLevenshtein, CellArgmax, DotProduct, MinHashXor, PqCodes, Sha512_256, SimHashBits, SortedLongIntersect}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so they resolve by name in SQL and via call_function — the
  * sanctioned way to add codegen'd functions without forking Spark. Install
  * with `.withExtensions(new GraftExtensions)` (Sessions.local does). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Builder =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression

  private val functions: Seq[(FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"), DotProduct.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(c(0), c(1))),
    (FunctionIdentifier("graft_sha512_256"), Sha512_256.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Sha512_256(c(0))),
    (FunctionIdentifier("graft_isect"), SortedLongIntersect.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedLongIntersect(c(0), c(1))),
    (FunctionIdentifier("graft_lev"), BandedLevenshtein.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BandedLevenshtein(c(0), c(1), c(2))),
    (FunctionIdentifier("graft_argmax_cell"), CellArgmax.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CellArgmax(c(0), c(1), c(2), c(3), c(4))),
    (FunctionIdentifier("graft_pq_codes"), PqCodes.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqCodes(c(0), c(1), c(2))),
    (FunctionIdentifier("graft_simhash"), SimHashBits.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashBits(c(0), c(1))),
    (FunctionIdentifier("graft_minhash"), MinHashXor.info,
      (c: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashXor(c(0), c(1))))

  /** Idempotent per-session registration, for sessions built without
    * `.withExtensions` (e.g. a harness-owned SparkSession running one of
    * our queries directly). */
  def ensure(s: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      if (!s.catalog.functionExists(id.funcName)) {
        s.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
    }
}
