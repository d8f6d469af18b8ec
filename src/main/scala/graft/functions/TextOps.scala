package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared row-local text primitives (tokens / shingles) used by the dedup
  * and text-analysis layers, with their exact DuckDB SQL mirrors — ONE
  * definition per primitive so the Spark plan and the oracle can never
  * drift apart. All higher-order functions: map-side, no shuffle, no UDF.
  */
object TextOps {

  /** Whitespace tokens, empty-free. */
  def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Distinct word-3-gram shingles; short docs fall back to the whole text
    * as one shingle. */
  def shingles(tk: Column): Column =
    array_distinct(
      when(size(tk) >= 3,
        transform(sequence(lit(0), size(tk) - 3), i =>
          concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2),
            element_at(tk, i + 3))))
        .otherwise(array(concat_ws(" ", tk))))

  /** DuckDB mirror of [[toks]] (expects `text` in scope). */
  val toksSql: String =
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  /** DuckDB mirror of [[shingles]] (expects `tk` in scope). */
  val shinglesSql: String =
    s"""list_distinct(CASE WHEN len(tk) >= 3 THEN
       |   list_transform(range(len(tk)-2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
       | ELSE [array_to_string(tk, ' ')] END)""".stripMargin
}
