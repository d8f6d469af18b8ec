package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scaled-integer half-up of integer rationals — THE portable form for any
  * score defined as num/den of integers. round(double, n) of such rationals
  * flips on exact half-boundaries between engines (see CHANGELOG round 2);
  * these helpers emit `round(num/den · scale)` as a long, with the exact
  * integer numerator and one floor division, plus the DuckDB mirror so both
  * sides are generated from one definition. Zero denominators yield 0.
  *
  * Exactness: all arithmetic is 38-digit DECIMAL on Spark and HUGEINT
  * (int128) on DuckDB — exact while |num·2·scale + den| < 10^38, replacing
  * the previous double-based floor that silently mis-rounded past 2^53
  * (ADVICE r2). Both engines' integer division truncates toward zero, so
  * floor semantics for negative numerators (rr can be < 0) come from the
  * same explicit remainder adjustment on both sides.
  *
  * PRECONDITION: the CALLER's num/den expressions must evaluate in int64 —
  * the widening here covers only the internal ·2·scale blowup. A caller
  * expression that itself overflows int64 fails LOUDLY on both engines
  * (Spark ANSI arithmetic and DuckDB BIGINT both raise; spec-verified),
  * never silently.
  */
object ExactRatio {

  private val D38 = DecimalType(38, 0)

  /** den must be non-negative (counts/sums of non-negative integers);
    * num may be negative. Hybrid evaluation: rows whose intermediate
    * num·2·scale+den provably fits a long take the pure 64-bit path (codegen
    * integer ops — decimal arithmetic is ~10× slower and would tax every
    * row for the rare huge one); only rows beyond the bound pay DECIMAL. */
  def scaled(num: Column, den: Column, scale: Long): Column = {
    def floorDiv(n: Column, d: Column): Column = {
      val q0 = call_function("div", n, d) // integral divide, truncates to 0
      val r = n - q0 * d
      when(r < 0, q0 - 1L).otherwise(q0)
    }
    // |num|·2·scale ≤ MAX/2 and den ≤ MAX/4 ⇒ no long overflow anywhere
    val numBound = Long.MaxValue / (4L * scale)
    val denBound = Long.MaxValue / 4L
    val longPath = floorDiv(num * (2L * scale) + den, den * 2L)
    val decPath = {
      val n = num.cast(D38) * lit(2L * scale) + den.cast(D38)
      val d = den.cast(D38) * lit(2L)
      val q0 = call_function("div", n, d)
      val r = n - q0.cast(D38) * d
      when(r < 0, q0 - 1L).otherwise(q0)
    }
    when(den === 0L, 0L)
      .otherwise(when(
        num < numBound && num > -numBound && den < denBound, longPath)
        .otherwise(decPath))
      .cast("long")
  }

  def scaledSql(num: String, den: String, scale: Long): String = {
    val n = s"(CAST(($num) AS HUGEINT) * ${2L * scale} + ($den))"
    val d = s"(CAST(($den) AS HUGEINT) * 2)"
    val q0 = s"($n // $d)"
    s"CAST(CASE WHEN ($den) = 0 THEN 0 " +
      s"WHEN $n - $q0 * $d < 0 THEN $q0 - 1 ELSE $q0 END AS BIGINT)"
  }
}
