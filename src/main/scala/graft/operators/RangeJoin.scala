package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second of the two time-join
  * operators the reference lacks entirely (the first, as-of, is
  * EventQueries.q44). Spark has no native range join, and the naive
  * formulation — a join on nothing but inequalities — plans as a
  * nested-loop cross product: O(|intervals|·|points|) comparisons, which
  * is exactly the all-pairs blowup that kills at 100 TB.
  *
  * The scalable shape is bucketed equi-join (the same trick every
  * engine's range-join optimization applies): pick a bin width, explode
  * each interval into the bins it covers, map each point to its single
  * bin, equi-join on (keys :+ bin) — a plain shuffled/broadcast hash
  * join — then apply the exact inequality as a residual filter. A
  * qualifying (interval, point) pair meets in exactly one bin (the
  * point's), so the output needs no dedup.
  *
  * Cost model: intervals replicate into ceil(len/binWidth)+1 rows, so
  * pick binWidth on the order of the typical interval length — bins per
  * interval stay O(1) and the join is one ordinary shuffle. Skewed keys
  * compose with the usual salting (operators.Scale) since the join is
  * equi after binning.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (interval row, point row) pair
    * with equal `keys` and `startCol <= pointTs < endCol`. Interval
    * bounds and the point column must be timestamps; `binWidth` is in
    * seconds. Output carries all interval columns plus the point's
    * columns (callers project/aggregate on top). */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, pointTsCol: String,
      keys: Seq[String], binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, "binWidthSec must be positive")
    val binUs = binWidthSec * 1000000L
    // end is exclusive: the last covered bin is the one holding end-1µs
    val iBins = intervals.withColumn("__bin",
      explode(sequence(
        floorDiv(unix_micros(col(startCol)), binUs),
        floorDiv(unix_micros(col(endCol) - expr("INTERVAL 1 MICROSECOND")),
          binUs))))
    val pBins = points.withColumn("__bin",
      floorDiv(unix_micros(col(pointTsCol)), binUs))
    iBins.join(pBins, keys :+ "__bin")
      .filter(col(pointTsCol) >= col(startCol) &&
        col(pointTsCol) < col(endCol))
      .drop("__bin")
  }

  private def floorDiv(a: Column, b: Long): Column =
    floor(a / lit(b)).cast("long")
}
