package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 coverage) to DataFrame
  * builders; `oracleSql` holds the DuckDB-equivalent SQL for each (same
  * output column names — the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TpchQueries.q01_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TpchQueries.all ++
      graft.queries.EventQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.VectorQueries.all ++
      graft.queries.MultimodalQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.TpchQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.MultimodalQueries.oracles
}
