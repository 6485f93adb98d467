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
  * Scale shape: ONE pass over the data — physically, not just in the
  * plan text: the wide aggregate has exactly ONE consumer (a
  * stack(C, ...) unpivot of its single row — Spark does not CSE
  * across union branches, so the per-column-select-then-union shape
  * this replaced re-ran the aggregate C times). The multi-column
  * exact distinct rides Spark's expand (one replicated stream per
  * profiled column — a C× map-side cost, each stream combining to
  * its own cell set before the shuffle): the documented profiling
  * price. Bound the COLUMN list, never the rows; for distinct-free
  * profiles of very wide tables, theta sketches
  * ([[Sketch.thetaSketch]]) are the bounded-error alternative. */
object Profile {

  /** Census of `cols` in `df`: (col_name, n_rows, n_null,
    * n_distinct, min_s, max_s), one row per column in the given
    * order. n_distinct counts non-null values; an all-null column
    * reports NULL min_s/max_s and 0 distinct. `cols` must be
    * duplicate-free; names may contain dots (referenced quoted, so
    * `a.b` profiles the top-level column, never a struct path). */
  def tableCensus(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile list [${cols.mkString(", ")}]")
    cols.foreach(c => require(df.columns.contains(c),
      s"no column '$c' in [${df.columns.mkString(", ")}]"))
    // positional aliases + quoted references: immune to dots,
    // backticks, and any alias collision a raw name could cause
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val f = df.col(s"`${c.replace("`", "``")}`")
      Seq(count(f).as(s"__nn_$i"), countDistinct(f).as(s"__nd_$i"),
        min(f).cast("string").as(s"__mn_$i"),
        max(f).cast("string").as(s"__mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.indices.map(i =>
      s"__cn_$i, __nn_$i, __nd_$i, __mn_$i, __mx_$i").mkString(", ")
    wide
      .withColumns(cols.zipWithIndex.map { case (c, i) =>
        s"__cn_$i" -> lit(c) }.toMap)
      .select(col("__n"), expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, __nn, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
