package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV and JSON/NDJSON
  * roundtrips with explicit schemas (SURVEY.md §2.2 scans/sources row).
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("csv roundtrip with header + explicit schema preserves values") {
    val dir = tempDir("csv-")
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.count() == src.count())
    val a = src.agg(sum($"o_totalprice".cast("decimal(12,2)")))
      .head.getDecimal(0)
    val b = back.agg(sum($"o_totalprice".cast("decimal(12,2)")))
      .head.getDecimal(0)
    assert(a == b)
  }

  test("NDJSON roundtrip (the reference's wire format) preserves nested " +
      "and optional fields") {
    val dir = tempDir("json-")
    // events.ts is parquet nanos; Tables.events converts to micros
    val src = Tables.events(spark, sfDir).limit(200)
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == 200)
    assert(back.select(sum(length($"props"))).head.getLong(0) ==
      src.select(sum(length($"props"))).head.getLong(0))
  }

  test("ORC roundtrip preserves values and pushes filters into the scan") {
    val dir = tempDir("orc-")
    val src = spark.read.parquet(s"$sfDir/orders.parquet")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    val a = src.agg(sum($"o_totalprice".cast("decimal(12,2)")))
      .head.getDecimal(0)
    val b = back.agg(sum($"o_totalprice".cast("decimal(12,2)")))
      .head.getDecimal(0)
    assert(a == b)
    // predicate pushdown reaches the ORC scan like it does for parquet
    val q = back.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters:") &&
      formatted.contains("o_orderpriority"), formatted.take(1500))
    assert(q.count() ==
      src.filter($"o_orderpriority" === "1-URGENT").count())
  }

  test("compressed sinks: zstd parquet and gzip csv read back identically") {
    val dir = tempDir("zstd-")
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    src.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    assert(spark.read.parquet(dir).count() == src.count())
    val cdir = tempDir("gzcsv-")
    src.limit(100).write.mode("overwrite")
      .option("compression", "gzip").option("header", "true").csv(cdir)
    assert(spark.read.option("header", "true").schema(src.schema)
      .csv(cdir).count() == 100)
  }
}
