package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scaled-integer half-up of integer rationals — THE portable form for any
  * score defined as num/den of integers. round(double, n) of such rationals
  * flips on exact half-boundaries between engines (see CHANGELOG round 2);
  * these helpers emit `round(num/den · scale)` as a long, with the exact
  * integer numerator and one floor division, plus the DuckDB mirror so both
  * sides are generated from one definition. Zero denominators yield 0. */
object ExactRatio {

  def scaled(num: Column, den: Column, scale: Long): Column =
    when(den === 0L, 0L).otherwise(
      floor((num * (2L * scale) + den).cast("double") / (den * 2L).cast("double"))
        .cast("long"))

  def scaledSql(num: String, den: String, scale: Long): String =
    s"CAST(CASE WHEN ($den) = 0 THEN 0 ELSE floor((($num) * ${2L * scale} + ($den)) * 1.0 / (($den) * 2)) END AS BIGINT)"
}
