package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — the conversion-credit report next to
  * [[Funnel]] and [[Markov]] in the event-analytics family: which
  * channels open journeys, which close them, and how long the paths
  * are. Each conversion event closes a PATH: the same user's touch
  * events after their previous conversion and strictly before this
  * one. Touches after a user's last conversion never converted and
  * are excluded; so are paths with zero touches (an unassisted
  * conversion has nothing to attribute).
  *
  * The surface is deliberately ALL-INTEGER: per (channel, path_len) —
  * touch participations, first-touch closures, last-touch closures.
  * First/last-touch credit reads off directly; LINEAR credit is
  * Σ n_touches/path_len over a channel's rows, exact by construction
  * because the denominator is pinned per row (publishing a summed
  * float credit would gate on addition order — the house double rule
  * says publish the exact integers and let one final division happen
  * at read time).
  *
  * Scale shape: one per-user running-sum window assigns every event
  * its path key (conversions seen so far — per-user partitions, the
  * q24/q169 shape), one join against the closed-path keys, two
  * rank windows over (user, path) partitions (path-sized), then
  * channel-keyed hash aggs. Nothing global, nothing driver-side. */
object Attribution {

  /** Per (channel, path_len) attribution census. Output: (channel,
    * path_len, n_touches, n_first, n_last). `orderCols` must make the
    * per-user event order total (e.g. ts, event_id). */
  def touchCredits(events: DataFrame, userCol: String,
      typeCol: String, orderCols: Seq[String],
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type")
    require(orderCols.nonEmpty, "need ordering columns")
    val ord = orderCols.map(col)
    val prev = Window.partitionBy(col(userCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = events
      .filter(col(userCol).isNotNull &&
        orderCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(typeCol).isin((convType +: touchTypes): _*))
      .withColumn("__pk", coalesce(
        sum(when(col(typeCol) === convType, lit(1L)).otherwise(lit(0L)))
          .over(prev), lit(0L)))
    val closed = e.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col("__pk"))
    val touches = e.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("__u"), col("__pk"),
        col(typeCol).as("channel"),
        struct(ord: _*).as("__o"))
      .join(closed, Seq("__u", "__pk"))
    val path = Window.partitionBy(col("__u"), col("__pk"))
    val t = touches
      .withColumn("path_len", count(lit(1)).over(path))
      .withColumn("__rf",
        row_number().over(path.orderBy(col("__o").asc)))
      .withColumn("__rl",
        row_number().over(path.orderBy(col("__o").desc)))
    val tc = t.groupBy(col("channel"), col("path_len"))
      .agg(count(lit(1)).as("n_touches"))
    val fc = t.filter(col("__rf") === 1)
      .groupBy(col("channel"), col("path_len"))
      .agg(count(lit(1)).as("n_first"))
    val lc = t.filter(col("__rl") === 1)
      .groupBy(col("channel"), col("path_len"))
      .agg(count(lit(1)).as("n_last"))
    tc.join(fc, Seq("channel", "path_len"), "left")
      .join(lc, Seq("channel", "path_len"), "left")
      .select(col("channel"), col("path_len"), col("n_touches"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"))
  }
}
