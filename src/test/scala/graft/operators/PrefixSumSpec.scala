package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSuite {
  import spark.implicits._

  test("distributed two-pass prefix sum equals the single-task global " +
      "window, across partition counts and with negative values") {
    val df = (0L until 1000L).map(i => (i, (i % 7) - 3)).toDF("id", "v")
    val naive = df.withColumn("expect",
        sum($"v").over(Window.orderBy($"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"expect")
    Seq(1, 3, 8, 32).foreach { p =>
      val got = PrefixSum.withRunningTotal(df, Seq("id"), "v",
        numPartitions = p)
      val diff = got.join(naive, "id")
        .filter($"v_cum" =!= $"expect").count()
      assert(diff == 0, s"numPartitions=$p")
    }
  }

  test("prefix sum parallelizes: the plan range-partitions instead of " +
      "collapsing into one global-sort window task") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars")
    // stage 1 spreads the work over the range partitions — never the
    // one task a global orderBy window would use (AQE may later
    // coalesce the tiny downstream join; that's fine, the scan is the
    // stage that matters)
    val stage = docs.repartitionByRange(8, $"doc_id")
      .withColumn("__pid", spark_partition_id())
    val spread = stage.groupBy($"__pid").count().count()
    assert(spread >= 2, s"only $spread populated range partitions")
    val cum = PrefixSum.withRunningTotal(docs, Seq("doc_id"), "n_chars",
      numPartitions = 8)
    val plan = cum.queryExecution.executedPlan.toString
    // no window with an empty partition spec anywhere in the final plan
    assert(!java.util.regex.Pattern.compile(
        "Window \\[[^\\]]*\\], \\[\\]").matcher(plan).find(),
      "found an unpartitioned (single-task) window")
    val total = cum.agg(max($"n_chars_cum")).head().getLong(0)
    val expect = docs.agg(sum($"n_chars")).head().getLong(0)
    assert(total == expect)
  }

  test("withRunningTotals (multi-column, r19) == nested single-column " +
      "passes, one scan for both columns") {
    val df = (0L until 800L)
      .map(i => (i, (i % 5) - 2, (i % 11) + 1)).toDF("id", "x", "y")
    val nested = PrefixSum.withRunningTotal(
      PrefixSum.withRunningTotal(df, Seq("id"), "x", 8), Seq("id"), "y", 8)
      .select($"id", $"x_cum".as("ex"), $"y_cum".as("ey"))
    val once = PrefixSum.withRunningTotals(df, Seq("id"), Seq("x", "y"), 8)
    val diff = once.join(nested, "id")
      .filter($"x_cum" =!= $"ex" || $"y_cum" =!= $"ey").count()
    assert(diff == 0)
  }
}
