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
}
