package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total over a GLOBAL order) — the
  * scan primitive behind sequence packing, cumulative quotas, and
  * percentile assignment in training-data pipelines.
  *
  * The naive formulation — a window over `orderBy(...)` with no
  * partitionBy — funnels the whole table through ONE task, the classic
  * Spark scan bottleneck. The scalable shape is the textbook two-pass
  * scan: range-partition by the order key (partition i's keys all sort
  * before partition i+1's), run a partition-local running total, then
  * add each partition's prefix offset (one tiny driver-side pass over
  * P partial sums, broadcast back). Every stage is parallel; the only
  * sequential work is the P-element offset scan.
  *
  * Correctness leans on the range-partitioner invariant (partition id
  * order == key order) and a final per-partition sort, so ties on the
  * order key must be broken by the caller's key list to keep the
  * global order total (pass id last).
  */
object PrefixSum {

  /** Adds `<valueCol>_cum` = inclusive running total of `valueCol` over
    * the global `orderCols` order. The order must be total (append a
    * unique id as the last key). */
  /** Stage 1: range-partitioned, per-partition running totals, pinned.
    * Pinning matters for correctness, not just cost: repartitionByRange
    * SAMPLES its bounds with a seed tied to the physical plan instance,
    * so re-evaluating the lineage could place rows in different
    * partitions between the totals pass and the final join — __pid must
    * be computed exactly once. */
  private[operators] def localStage(df: DataFrame, orderCols: Seq[String],
      valueCol: String, numPartitions: Int): DataFrame = {
    val ranged0 = if (numPartitions > 0)
      df.repartitionByRange(numPartitions, orderCols.map(col): _*)
    else df.repartitionByRange(orderCols.map(col): _*)
    val ranged = ranged0
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    // partition-local inclusive running total; the window's partitionBy
    // matches the physical partitioning, so rows stay where they are
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__local", sum(col(valueCol)).over(w))
      .localCheckpoint()
  }

  def withRunningTotal(df: DataFrame, orderCols: Seq[String],
      valueCol: String, numPartitions: Int = 0): DataFrame = {
    val local = localStage(df, orderCols, valueCol, numPartitions)
    // P partial sums -> exclusive prefix offsets (driver-side scan of a
    // P-element array; P is the parallelism, not the data size)
    val totals = local.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).cast("long").as("__total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn(s"${valueCol}_cum", col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
