package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: the engine's relations
  * round-trip losslessly through JSON-lines and CSV (the interchange
  * formats a pipeline meets at its edges). */
class SourceFormatsSpec extends SparkSpec {
  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("documents round-trip through JSON lines") {
    val dir = tmp("graft_json")
    val src = Tables.documents(spark, sf)
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === src.count())
    // values survive: per-doc text hash totals agree
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(crc32(col("text")))).head().getLong(0)
    assert(h(back) === h(src))
  }

  test("relations round-trip through ORC losslessly") {
    val dir = tmp("graft_orc")
    val src = Domain.commits(spark, sf)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    // ORC carries its own schema: no explicit schema needed, types survive
    assert(back.schema === src.schema)
  }

  test("scalar relations round-trip through CSV with explicit schema") {
    val dir = tmp("graft_csv")
    val src = Domain.commits(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
  }
}
