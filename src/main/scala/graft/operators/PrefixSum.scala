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
  def withRunningTotal(df: DataFrame, orderCols: Seq[String],
      valueCol: String, numPartitions: Int = 0): DataFrame =
    withRunningTotals(df, orderCols, Seq(valueCol), numPartitions)

  /** [[withRunningTotal]] for SEVERAL value columns in ONE two-pass
    * scan (r19): nesting the single-column form pays the range
    * shuffle, the bounds-sampling job, the partition-local window, and
    * the P-element totals collect once PER COLUMN — ksTest's two CDFs
    * ride the same (v)-ordered scan, so one pass carries both. Adds
    * `<col>_cum` for every `valueCols` entry; identical output to the
    * nested form (same order, same offsets, column-wise independent
    * sums). */
  def withRunningTotals(df: DataFrame, orderCols: Seq[String],
      valueCols: Seq[String], numPartitions: Int = 0): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val ranged0 = if (numPartitions > 0)
      df.repartitionByRange(numPartitions, orderCols.map(col): _*)
    else df.repartitionByRange(orderCols.map(col): _*)
    val ranged = ranged0
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // checkpoint pins the stage-1 frame — for correctness, not just
    // cost: repartitionByRange SAMPLES its bounds with a seed tied to
    // the physical plan instance, so re-evaluating the lineage could
    // place rows in different partitions between the totals pass and
    // the final join — __pid must be computed exactly once
    val local = valueCols.zipWithIndex.foldLeft(ranged) {
      case (acc, (vc, i)) =>
        acc.withColumn(s"__local_$i", sum(col(vc)).over(w))
    }.localCheckpoint(false)
    // P partial sums -> exclusive prefix offsets (driver-side scan of a
    // P-element array; P is the parallelism, not the data size)
    val totals = local.groupBy(col("__pid"))
      .agg(valueCols.zipWithIndex.map { case (vc, i) =>
          sum(col(vc)).cast("long").as(s"__total_$i") }.head,
        valueCols.zipWithIndex.map { case (vc, i) =>
          sum(col(vc)).cast("long").as(s"__total_$i") }.tail: _*)
      .collect()
      .map(r => (r.getInt(0),
        valueCols.indices.map(i => r.getLong(i + 1)).toArray))
      .sortBy(_._1)
    val offsets = totals.scanLeft(
      (0, Array.fill(valueCols.size)(0L))) { case ((_, acc), (pid, t)) =>
        (pid, acc.zip(t).map { case (x, y) => x + y })
      }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    val offRows = offsets.toSeq.map { case (pid, off) =>
      org.apache.spark.sql.Row.fromSeq(pid +: off.toSeq) }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      valueCols.indices.map(i =>
        org.apache.spark.sql.types.StructField(s"__off_$i",
          org.apache.spark.sql.types.LongType, nullable = false)))
    // LOCAL relation, not an RDD-backed frame: a parallelize()-backed
    // scan carries defaultSizeInBytes (huge) and that estimate
    // propagates up — q199's checkpoint-ladder joins flipped from
    // broadcast to sort-merge when this frame lost its known tiny size
    // (caught by the r19 plan gate).
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val joined = local.join(broadcast(offDf), "__pid")
    val withCums = valueCols.zipWithIndex.foldLeft(joined) {
      case (acc, (vc, i)) =>
        acc.withColumn(s"${vc}_cum", col(s"__local_$i") + col(s"__off_$i"))
    }
    val drop = Seq("__pid") ++
      valueCols.indices.flatMap(i => Seq(s"__local_$i", s"__off_$i"))
    withCums.drop(drop: _*)
  }
}
