package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed MERGE (upsert) — the Delta/Iceberg `MERGE INTO` shape expressed
  * as one declarative plan: matched rows take the source's values,
  * matched rows satisfying `deleteWhen` are dropped, unmatched source
  * rows are inserted, unmatched target rows pass through. The batch
  * CDC-apply / SCD-refresh primitive a warehouse sync runs every cycle.
  *
  * Scale shape: one full-outer sort-merge join on the merge keys
  * (Catalyst broadcasts instead when the source fits, the usual CDC
  * case of a small changeset against a huge target), plus one exchange
  * on the SOURCE side only for the duplicate-source-key guard. The
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
    // Evaluate deleteWhen against the FULL source row (it may reference
    // source-only columns like a CDC `op` marker) BEFORE projecting to
    // the target's columns, then prefix-rename the source's non-key
    // columns: source and target are routinely derived from the SAME
    // table (CDC against yesterday's snapshot), and renamed columns
    // sidestep Spark's ambiguous self-join attribute resolution.
    // Delta/Iceberg MERGE raises when several source rows match one
    // target key — a full-outer join would instead silently MULTIPLY
    // the target row, the worst CDC failure mode. Enforce the same
    // contract in-plan: a per-key count window over the source and a
    // raise_error filter, so a duplicate changeset fails the job the
    // moment it's scanned. The window adds one exchange on the SOURCE
    // only — the small changeset side, never the target.
    //
    // Deliberately STRICTER than Delta on the insert side: duplicate
    // keys that match no target row also raise (Delta would insert
    // both — we treat a key-duplicated changeset as malformed either
    // way). Rows with a NULL in any merge key are EXEMPT: the
    // equi-join can never match them against a target row, so each is
    // an independent insert — two null-key insert rows are legal, not
    // a duplicate (ADVICE r06: the window groups null keys together,
    // so counting them tripped the guard on a valid changeset).
    val matchable = keys.map(col(_).isNotNull).reduce(_ && _)
    val wk = Window.partitionBy(keys.map(col): _*)
    val unique = source
      .withColumn("__nk", count(when(matchable, lit(1))).over(wk))
      .filter(when(col("__nk") > 1,
          raise_error(concat(lit("mergeInto: multiple source rows for " +
            s"merge key (${keys.mkString(",")}): "),
            concat_ws(",", keys.map(c => col(c).cast("string")): _*)))
            .cast("boolean"))
        .otherwise(lit(true)))
      .drop("__nk")
    val s = deleteWhen.fold(
        unique.withColumn("__del", lit(false))) { c =>
        unique.withColumn("__del", coalesce(c, lit(false)))
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

  /** Compact a CDC change log to its current snapshot: last writer wins
    * per key (total order = `orderCols`, so supply a unique tiebreaker
    * after the timestamp), rows whose final op is a delete disappear.
    * The other half of the CDC story next to [[mergeInto]] — mergeInto
    * applies a changeset to a table, latestSnapshot derives the table
    * from the log alone.
    *
    * Scale shape: one shuffle on the keys, per-partition top-1 heap
    * inside the window (WindowGroupLimit pushes the rank filter down to
    * a partial top-1 before the exchange — the log is scanned once and
    * only each task's per-key champion rides the shuffle). */
  def latestSnapshot(log: DataFrame, keys: Seq[String],
      orderCols: Seq[String], deleteWhen: Option[Column] = None)
      : DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty,
      "need key and order columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val latest = log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    deleteWhen.fold(latest)(c => latest.filter(!coalesce(c, lit(false))))
  }

  /** SCD Type-2 history from a change log: per key in `orderCols`
    * order, drop no-op changes (every tracked column equal to its
    * predecessor), then close each surviving version with its
    * successor's start — emits `tracked` plus valid_from (first order
    * column), valid_to (next valid_from, null while current) and
    * is_current. The dimension-table historization that pairs with
    * [[mergeInto]]'s overwrite semantics.
    *
    * Scale shape: two window passes over the SAME (key, order)
    * partitioning — Catalyst plans one exchange and reuses its sort for
    * both lag() and lead(); no second shuffle, no self-join. */
  def applyScd2(log: DataFrame, keys: Seq[String], orderCols: Seq[String],
      tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty && tracked.nonEmpty,
      "need key, order, and tracked columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // a row opens a new version iff it is the key's FIRST row or any
    // tracked column differs (null-safe) from its predecessor. The
    // explicit first-row test matters: with null-safe equality alone, a
    // key whose initial tracked value is null would compare null <=>
    // null against the missing predecessor and silently lose its first
    // version.
    val isFirst = row_number().over(w) === 1
    val changed = isFirst || tracked.map(c =>
      !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _)
    val versions = log
      .select((keys ++ orderCols ++ tracked).distinct.map(col): _*)
      .withColumn("__chg", changed)
      .filter(col("__chg")).drop("__chg")
    val vf = col(orderCols.head)
    versions
      .withColumn("valid_from", vf)
      .withColumn("valid_to", lead(vf, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ tracked :+ "valid_from" :+ "valid_to"
        :+ "is_current").distinct.map(col): _*)
  }
}
