package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "what is actually in this table?"
  * census an ops/data-quality dashboard runs before anything else
  * (and the first thing a pipeline owner asks of a new 100 TB
  * delivery): per column, row count, null count, EXACT distinct
  * count, and min/max rendered as strings, schema-agnostically — one
  * output row per profiled column regardless of the column's type.
  *
  * Exactness: counts are exact longs; min/max stringify AFTER the
  * typed aggregation (so numeric columns order numerically, not
  * lexically). Caveat, documented not silent: STRING min/max compare
  * by UTF-16 code unit here and by UTF-8 byte in engines like DuckDB
  * — identical on ASCII and the entire BMP, divergent only for
  * supplementary-plane boundaries; profile gates pin ASCII fixtures.
  *
  * Scale shape: ONE pass over the data. The multi-column exact
  * distinct rides Spark's expand (one replicated stream per profiled
  * column — a C× map-side cost, each stream combining to its own
  * cell set before the shuffle): the documented profiling price.
  * Bound the COLUMN list, never the rows; for distinct-free profiles
  * of very wide tables, theta sketches ([[Sketch.thetaSketch]]) are
  * the bounded-error alternative. The per-column union at the end
  * runs over single-row aggregate frames — free. */
object Profile {

  /** Census of `cols` in `df`: (col_name, n_rows, n_null,
    * n_distinct, min_s, max_s), one row per column in the given
    * order. n_distinct counts non-null values; an all-null column
    * reports NULL min_s/max_s and 0 distinct. */
  def tableCensus(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    cols.foreach(c => require(df.columns.contains(c),
      s"no column '$c' in [${df.columns.mkString(", ")}]"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    cols.map { c =>
      wide.select(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"))
    }.reduce(_ unionByName _)
  }
}
