package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("tableCensus: exact counts, TYPED min/max stringified (numeric " +
      "2 < 10, not lexical '10' < '2'), all-null column, unknown " +
      "column rejected") {
    val df = Seq((1L, Option("b"), 10L), (2L, Option.empty[String], 2L),
      (2L, Option("a"), 10L))
      .toDF("id", "s", "v")
      .withColumn("nul", lit(null).cast("string"))
    val got = Profile.tableCensus(df, Seq("id", "s", "v", "nul"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 3L, 0L, 2L, Some("1"), Some("2"))))
    assert(got("s") == (("s", 3L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("v") == (("v", 3L, 0L, 2L, Some("2"), Some("10"))))
    assert(got("nul") == (("nul", 3L, 3L, 0L, None, None)))
    intercept[IllegalArgumentException] {
      Profile.tableCensus(df, Seq("missing"))
    }
  }

  test("tableCensus: duplicate profile list rejected loudly; a " +
      "dotted column name profiles the top-level column (quoted " +
      "reference, never a struct path)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "a.b")
    intercept[IllegalArgumentException] {
      Profile.tableCensus(df, Seq("id", "id"))
    }
    val got = Profile.tableCensus(df, Seq("a.b"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect()
    assert(got.toSeq == Seq(("a.b", 2L, 0L, 2L, Some("x"), Some("y"))))
  }

  test("tableCensus plan is physically one-pass: a single scan of " +
      "the input feeds the stack() unpivot, not one scan per column") {
    val dir = graft.TempDirs.scratch("profile-onepass")
    val p = s"$dir/t.parquet"
    Seq((1L, "a", 2L), (2L, "b", 3L)).toDF("x", "y", "z")
      .write.mode("overwrite").parquet(p)
    val census = Profile.tableCensus(spark.read.parquet(p),
      Seq("x", "y", "z"))
    val physical = census.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(physical).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$physical")
    assert(census.count() == 3L)
  }
}
