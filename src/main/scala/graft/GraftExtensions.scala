package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.expressions.DotProduct

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so they resolve by name in SQL and via call_function — the
  * sanctioned way to add codegen'd functions without forking Spark. Install
  * with `.withExtensions(new GraftExtensions)` (Sessions.local does). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  private val dotFunction = (
    FunctionIdentifier("graft_dot"),
    DotProduct.info,
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      DotProduct(children(0), children(1)))

  /** Idempotent per-session registration, for sessions built without
    * `.withExtensions` (e.g. a harness-owned SparkSession running one of
    * our queries directly). */
  def ensure(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.catalog.functionExists("graft_dot")) {
      s.sessionState.functionRegistry
        .registerFunction(dotFunction._1, dotFunction._2, dotFunction._3)
    }
}
