package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) — the Delta/Iceberg `MERGE INTO` shape expressed
  * as one declarative plan: matched rows take the source's values,
  * matched rows satisfying `deleteWhen` are dropped, unmatched source
  * rows are inserted, unmatched target rows pass through. The batch
  * CDC-apply / SCD-refresh primitive a warehouse sync runs every cycle.
  *
  * Scale shape: exactly one shuffle — a full-outer sort-merge join on
  * the merge keys (Catalyst broadcasts instead when the source fits,
  * the usual CDC case of a small changeset against a huge target). The
  * column arbitration is a per-row `when`, fully codegen'd; no second
  * pass, no driver state.
  */
object Merge {

  /** Merge `source` into `target` on equality of `keys`.
    *
    * @param deleteWhen predicate over the SOURCE row's columns; a
    *   matched target row whose source row satisfies it is deleted
    *   (standard MERGE `WHEN MATCHED AND cond THEN DELETE`). Unmatched
    *   source rows satisfying it are NOT inserted either — a delete
    *   marker for an absent row is a no-op, the usual CDC convention.
    * Output columns = target's, in target order. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains), s"keys $keys not all in target")
    require(cols.forall(source.columns.contains),
      "source must carry every target column")
    val nonKeys = cols.filterNot(keys.contains)
    // Evaluate deleteWhen against source columns BEFORE the join, then
    // prefix-rename the source's non-key columns: source and target are
    // routinely derived from the SAME table (CDC against yesterday's
    // snapshot), and renamed columns sidestep Spark's ambiguous
    // self-join attribute resolution entirely.
    val s = deleteWhen.fold(source.select(cols.map(col): _*)
        .withColumn("__del", lit(false))) { c =>
        source.select(cols.map(col): _*)
          .withColumn("__del", coalesce(c, lit(false)))
      }
      .select(keys.map(col) ++ nonKeys.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("__del"), lit(true).as("__s")): _*)
    // join(usingColumns) coalesces the key columns; a satisfied delete
    // marker drops the row, and each non-key column takes the source
    // value whenever a source row matched.
    val joined = target.join(s, keys, "full_outer")
      .filter(!coalesce(col("__del"), lit(false)))
    val arbitrated = nonKeys.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__s").isNotNull, col(s"__s_$c")).otherwise(col(c)))
    }
    arbitrated.select(cols.map(col): _*)
  }
}
