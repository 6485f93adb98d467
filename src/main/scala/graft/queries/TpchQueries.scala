package graft.queries

import graft.{Sql, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical operator coverage over the TPC-H-ish star schema
  * (SURVEY.md §2.2): scans w/ pushdown, projections, filters, hash and
  * broadcast joins, semi/anti joins, hash aggregation, rollup / grouping
  * sets, window functions, sort / top-k, set ops, scalar functions.
  *
  * Scale notes (100 TB design intent, verified via .explain on sf0.1):
  *  - dimension sides (region, nation, supplier, part, customer at low SF;
  *    region/nation always) are broadcast — no shuffle of the fact table
  *    for those joins; lineitem⋈orders shuffles on the join key only.
  *  - aggregates are partial+final hash aggs (map-side combine) — the
  *    shuffle carries one row per group per task, not per input row.
  *  - top-k is orderBy+limit → TakeOrderedAndProject: O(k) memory per
  *    partition, no global sort.
  *  - all money arithmetic goes through exact DECIMAL (see Sql) so results
  *    hash-match the DuckDB oracle bit-for-bit.
  */
object TpchQueries {
  import Sql._
  type Q = (SparkSession, String) => DataFrame

  /** q01: TPC-H Q1-style pricing summary — filter + hash agg with exact
    * decimal sums and a bit-stable mean. */
  val q01_pricing_summary: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  val q01_oracle: String = {
    import duck._
    s"""SELECT l_returnflag, l_linestatus,
       ${dsum("l_quantity")} AS sum_qty,
       ${dsum("l_extendedprice")} AS sum_base_price,
       CAST(sum(${discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
       CAST(sum(${charge("l_extendedprice", "l_discount", "l_tax")}) AS DOUBLE) AS sum_charge,
       ${davg("l_quantity")} AS avg_qty,
       ${davg("l_extendedprice")} AS avg_price,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30'
       GROUP BY l_returnflag, l_linestatus"""
  }

  /** q02: filter + projection — both must reach the parquet scan
    * (PushedFilters / pruned ReadSchema in .explain). */
  val q02_filter_project: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_size") >= 30 && col("p_type") === "ECONOMY")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))

  val q02_oracle: String =
    """SELECT p_partkey, p_name, p_brand, p_retailprice
       FROM part WHERE p_size >= 30 AND p_type = 'ECONOMY'"""

  /** q03: TPC-H Q3-style shipping priority — fact⋈fact shuffle join +
    * broadcast dim, agg, deterministic top-10. */
  val q03_top_orders: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03_oracle: String = {
    import duck._
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(${discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""
  }

  /** q04: TPC-H Q4-style — left-semi join (EXISTS) with an extra non-equi
    * conjunct, then count by priority. */
  val q04_order_priority: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q04_oracle: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders WHERE EXISTS (
         SELECT 1 FROM lineitem
         WHERE l_orderkey = o_orderkey
           AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority"""

  /** q05: TPC-H Q5-style local-supplier revenue — 6-way join; all dims
    * broadcast so the only shuffles are lineitem⋈orders and the final agg. */
  val q05_region_revenue: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q05_oracle: String = {
    import duck._
    s"""SELECT n_name,
       CAST(sum(${discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
       count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name"""
  }

  /** q06: TPC-H Q6-style forecast revenue — pure scan+filter+scalar agg;
    * the whole query is one WholeStageCodegen span with pushed filters. */
  val q06_revenue_filter: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 25)
      .agg(
        sum(money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q06_oracle: String = {
    import duck._
    s"""SELECT CAST(sum(${money("l_extendedprice")} * ${rate("l_discount")}) AS DOUBLE) AS revenue,
       count(*) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount >= 0.03 AND l_discount <= 0.07
         AND l_quantity < 25"""
  }

  /** q07: broadcast join lineitem⋈part + agg by brand with a distinct
    * count (expands to a two-phase agg; no extra shuffle of the fact). */
  val q07_brand_volume: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_items"))

  val q07_oracle: String = {
    import duck._
    s"""SELECT p_brand,
       ${dsum("l_quantity")} AS sum_qty,
       CAST(sum(${discPrice("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand"""
  }

  /** q08: left-anti join (NOT EXISTS) — customers with no pending ('P')
    * orders, rolled up to nation via a broadcast dim join. (Plain
    * no-orders-at-all is empty at every SF — all customers order.) */
  val q08_cust_without_orders: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_bal"))

  val q08_oracle: String = {
    import duck._
    s"""SELECT n_name, count(*) AS n_customers, ${dsum("c_acctbal")} AS sum_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
       GROUP BY n_name"""
  }

  /** q09: window functions — row_number / rank / lag / lead per customer.
    * One shuffle on the window partition key; all four windows share it. */
  val q09_window_rank: Q = (s, d) => {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("rn", row_number().over(byDate).cast("long"))
      .withColumn("price_rank", rank().over(byPrice).cast("long"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(byDate))
      .withColumn("next_order", lead(col("o_orderkey"), 1).over(byDate))
  }

  val q09_oracle: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_orderkey, 1) OVER w AS next_order
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  /** q10: running total + trailing 3-row window frame per customer, with
    * exact decimal accumulation for bit-stable doubles. */
  val q10_running_total: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("run_spend",
        sum(money(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("spend3",
        sum(money(col("o_totalprice")))
          .over(w.rowsBetween(-2, Window.currentRow)).cast("double"))
      .withColumn("n3",
        count(lit(1)).over(w.rowsBetween(-2, Window.currentRow)))
  }

  val q10_oracle: String = {
    import duck._
    s"""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(${money("o_totalprice")}) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend,
       CAST(sum(${money("o_totalprice")}) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend3,
       count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n3
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
  }

  /** q11: ROLLUP — hierarchical subtotals in one pass (Spark expands then
    * single hash agg; no per-level rescan). */
  val q11_rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))

  val q11_oracle: String = {
    import duck._
    s"""SELECT l_returnflag, l_linestatus,
       ${dsum("l_quantity")} AS sum_qty, count(*) AS n_items
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""
  }

  /** q12: GROUPING SETS (SQL-only surface in Spark) with grouping()
    * markers to disambiguate natural NULLs from subtotal NULLs. */
  val q12_grouping_sets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(s"""SELECT o_orderstatus, o_orderpriority,
      CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      count(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
  }

  val q12_oracle: String = {
    import duck._
    s"""SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
       ${dsum("o_totalprice")} AS sum_price,
       count(*) AS n_orders
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
  }

  /** q13: top-k — plans as TakeOrderedAndProject (per-partition heap of k,
    * then merge on driver), never a global sort. */
  val q13_topk_orders: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q13_oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** q14: distinct aggregates — exact distinct + conditional distinct. */
  val q14_distinct_agg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey")))
          .as("n_f_customers"),
        count(lit(1)).as("n_orders"))

  val q14_oracle: String =
    """SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_f_customers,
       count(*) AS n_orders
       FROM orders GROUP BY o_orderpriority"""

  /** q15: set operations — INTERSECT / EXCEPT / UNION with set (distinct)
    * semantics; Spark plans these as aggregates + joins. */
  val q15_setops: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("custkey"))
    keys("F").intersect(keys("O")).except(keys("P"))
      .union(keys("P").intersect(keys("O")))
      .distinct()
  }

  val q15_oracle: String =
    """SELECT DISTINCT custkey FROM (
         (SELECT custkey FROM
           (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
          EXCEPT
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P')
         UNION
         (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
          INTERSECT
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'))"""

  /** q16: scalar string functions — upper/substring/length/concat/replace/
    * regexp_extract, all codegen'd builtins (no UDFs). */
  val q16_string_funcs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 10, 9).as("name_num"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
        lpad(col("c_custkey").cast("string"), 12, "*").as("padded"))

  val q16_oracle: String =
    """SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 10, 9) AS name_num,
       CAST(length(c_name) AS BIGINT) AS name_len,
       concat(c_mktsegment, '/', c_name) AS seg_name,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
       lpad(CAST(c_custkey AS VARCHAR), 12, '*') AS padded
       FROM customer"""

  /** q17: date/time functions — truncation-based monthly agg plus
    * year/quarter extraction and day arithmetic. */
  val q17_date_funcs: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("month"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"))

  val q17_oracle: String = {
    import duck._
    s"""SELECT date_trunc('month', o_orderdate) AS month,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       count(*) AS n_orders,
       ${dsum("o_totalprice")} AS sum_price
       FROM orders GROUP BY 1, 2, 3"""
  }

  /** q18: CASE + exact math (floor/ceil/abs/mod — no transcendentals, so
    * doubles stay bit-identical across engines). */
  val q18_case_math: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("qty_bucket"),
        floor(col("l_extendedprice") / 10000).cast("long").as("price_band"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(abs(col("l_extendedprice") * -1)).as("sum_abs_price"),
        sum((col("l_linenumber") % 2).cast("long")).cast("long").as("n_odd"))

  val q18_oracle: String = {
    import duck._
    s"""SELECT
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid'
            ELSE 'high' END AS qty_bucket,
       CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_band,
       count(*) AS n_items,
       ${dsum("abs(l_extendedprice * -1)")} AS sum_abs_price,
       CAST(sum(CAST(l_linenumber % 2 AS BIGINT)) AS BIGINT) AS n_odd
       FROM lineitem GROUP BY 1, 2"""
  }

  /** q47: CUBE — all grouping combinations in one pass (completes the
    * rollup/grouping-sets/cube trio). */
  val q47_cube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_items"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))

  val q47_oracle: String = {
    import duck._
    s"""SELECT l_returnflag, l_linestatus,
       ${dsum("l_extendedprice")} AS sum_price,
       count(*) AS n_items,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"""
  }

  /** q48: pivot — status columns out of rows (groupBy + pivot with
    * pinned value list; plans as one hash agg, no per-value rescan). */
  val q48_pivot: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(money(col("o_totalprice"))))
      .select(col("o_orderpriority"),
        col("F").cast("double").as("F"),
        col("O").cast("double").as("O"),
        col("P").cast("double").as("P"))

  val q48_oracle: String = {
    import duck._
    s"""SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN ${money("o_totalprice")} END) AS DOUBLE) AS F,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN ${money("o_totalprice")} END) AS DOUBLE) AS O,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN ${money("o_totalprice")} END) AS DOUBLE) AS P
       FROM orders GROUP BY o_orderpriority"""
  }

  /** q49: exact interpolated percentiles per group (median + p90). */
  val q49_percentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n_items"))

  val q49_oracle: String =
    """SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       count(*) AS n_items
       FROM lineitem GROUP BY l_returnflag"""

  /** q50: date arithmetic — day diffs, interval shift, month-end. */
  val q50_date_arith: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("age_days"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_ts"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))

  val q50_oracle: String =
    """SELECT o_orderkey,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS age_days,
       o_orderdate + INTERVAL 90 DAY AS due_ts,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
       FROM orders"""

  /** q57: correlated scalar subqueries — per-customer max order value and
    * count above segment average (Catalyst de-correlates both into
    * aggregates + joins; no per-row re-execution). SQL surface (the
    * DataFrame API has no scalar-subquery syntax). */
  val q57_scalar_subquery: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
         (SELECT max(o_totalprice) FROM orders
          WHERE o_custkey = c_custkey) AS max_order,
         (SELECT count(*) FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT') AS n_urgent
         FROM customer""")
  }

  val q57_oracle: String =
    """SELECT c_custkey, c_mktsegment,
       (SELECT max(o_totalprice) FROM orders
        WHERE o_custkey = c_custkey) AS max_order,
       (SELECT count(*) FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderpriority = '1-URGENT') AS n_urgent
       FROM customer"""

  /** q59: bag-semantic set ops — INTERSECT ALL / EXCEPT ALL keep
    * duplicate multiplicities (counting semantics, unlike q15's DISTINCT
    * set ops; Spark plans generated-count joins). */
  val q59_setops_all: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("custkey"))
    keys("F").intersectAll(keys("O")).exceptAll(keys("P"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("multiplicity"))
  }

  val q59_oracle: String =
    """SELECT custkey, count(*) AS multiplicity FROM (
         (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
          INTERSECT ALL
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
         EXCEPT ALL
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P')
       GROUP BY custkey"""

  /** q60: unpivot / melt — wide measure columns to long form (Spark's
    * unpivot API; oracle via UNION ALL, the relational definition). */
  val q60_unpivot: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")),
        "attr", "val")

  val q60_oracle: String =
    """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
       FROM part
       UNION ALL
       SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
       FROM part"""

  /** q61: left outer join with null-aware aggregates — every customer
    * with their pending-order stats, zero-filled via coalesce (the join
    * side is empty for most customers, exercising null propagation). */
  val q61_outer_join: Q = (s, d) => {
    val pending = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "P")
    Tables.customer(s, d)
      .join(pending, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_pending"),
        coalesce(sum(money(col("o_totalprice"))), lit(0))
          .cast("double").as("pending_value"),
        max(col("o_orderdate")).as("last_pending"))
  }

  val q61_oracle: String = {
    import duck._
    s"""SELECT c_custkey,
       count(o_orderkey) AS n_pending,
       CAST(coalesce(sum(${money("o_totalprice")}), 0) AS DOUBLE)
         AS pending_value,
       max(o_orderdate) AS last_pending
       FROM customer LEFT JOIN orders
         ON c_custkey = o_custkey AND o_orderstatus = 'P'
       GROUP BY c_custkey"""
  }

  /** q62: window navigation — first/last/nth value and ntile quartiles
    * per customer (explicit full frames where the default running frame
    * would differ). */
  val q62_window_nav: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(full).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
        ntile(4).over(w).cast("long").as("quartile"))
  }

  val q62_oracle: String =
    """SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_order,
       nth_value(o_orderkey, 2) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_order,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  /** q76: MERGE INTO (operators.Merge) — a CDC changeset (every even
    * order: status→'U', price doubled; '1-URGENT' sources are delete
    * markers) applied to a target missing every third order. Covers all
    * four merge outcomes — update, insert, delete, pass-through — in
    * one oracle-checked result. Price×2 is exact in IEEE doubles, so
    * the whole row set hash-matches bit-for-bit. */
  val q76_merge_upsert: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val target = o.filter(col("o_orderkey") % 3 =!= 0)
    val source = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    graft.operators.Merge.mergeInto(target, source, Seq("o_orderkey"),
      deleteWhen = Some(col("o_orderpriority") === "1-URGENT"))
  }

  val q76_oracle: String =
    """WITH t AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
       s AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderdate,
               o_orderpriority
             FROM orders WHERE o_orderkey % 2 = 0)
       SELECT
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderkey
              ELSE t.o_orderkey END AS o_orderkey,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
              ELSE t.o_custkey END AS o_custkey,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
              ELSE t.o_orderstatus END AS o_orderstatus,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
              ELSE t.o_totalprice END AS o_totalprice,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate
              ELSE t.o_orderdate END AS o_orderdate,
         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
              ELSE t.o_orderpriority END AS o_orderpriority
       FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
       WHERE NOT coalesce(s.o_orderpriority = '1-URGENT', FALSE)"""

  /** q80: SCD Type-2 historization (operators.Merge.applyScd2) — orders
    * read as a per-customer status change log ((o_orderdate, o_orderkey)
    * total order): no-op status repeats are dropped, each surviving
    * version is closed by its successor's start, the open version is
    * flagged current. Two window passes over ONE (key, order) exchange. */
  val q80_scd2_history: Q = (s, d) =>
    graft.operators.Merge.applyScd2(Tables.orders(s, d),
      keys = Seq("o_custkey"), orderCols = Seq("o_orderdate", "o_orderkey"),
      tracked = Seq("o_orderstatus"))

  val q80_oracle: String =
    """WITH chg AS (
         SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
           lag(o_orderstatus) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS prev,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders),
       v AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus
             FROM chg
             WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev)
       SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS valid_to,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
       FROM v"""

  /** q159: exact edit-distance similarity join
    * ([[graft.operators.EditJoin.editDistancePairs]]) — record
    * linkage over document TITLE keys (first four tokens): all pairs
    * within levenshtein distance 2, found through the
    * provably-complete q-gram prefix index + length filter (Ed-Join),
    * then exactly reranked. The oracle is the brute-force all-pairs
    * join, so ANY candidate the prefix filter wrongly drops (or any
    * levenshtein disagreement between engines) hash-fails. Natural-
    * language keys are the operator's design point: the gram
    * vocabulary GROWS with the corpus, keeping posting lists bounded
    * (the operator scaladoc documents the bounded-entropy worst case
    * — fixed-format keys like zero-padded ids — where any fixed-q
    * gram index degenerates; EditJoinSpec proves exactness on exactly
    * that corpus with customer names). */
  val q159_edit_join: Q = (s, d) =>
    graft.operators.EditJoin.editDistancePairs(
      Tables.documents(s, d).select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ")
          .as("title")),
      "title", "doc_id", k = 2, q = 2)

  val q159_oracle: String =
    """WITH s AS (SELECT doc_id,
         array_to_string((string_split(text, ' '))[1:4], ' ') AS title
       FROM documents)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
       FROM s a JOIN s b
         ON a.doc_id < b.doc_id
         AND abs(length(a.title) - length(b.title)) <= 2
       WHERE levenshtein(a.title, b.title) <= 2"""

  /** q163: k-anonymity release audit
    * ([[graft.operators.Privacy.kAnonymityClasses]]) — the customer
    * table profiled over the quasi-identifier pair (nation, market
    * segment) at k=5: every equivalence class with its size and risk
    * flag. The 25×5 class space over small-SF row counts guarantees
    * genuinely at-risk classes exist, so the flag is load-bearing.
    * One hash-agg, the exact-dedup plan shape. */
  val q163_k_anonymity: Q = (s, d) =>
    graft.operators.Privacy.kAnonymityClasses(Tables.customer(s, d),
      Seq(col("c_nationkey"), col("c_mktsegment")), k = 5)

  val q163_oracle: String =
    """SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS class_size,
         count(*) < 5 AS at_risk
       FROM customer GROUP BY 1, 2"""

  /** q218: t-closeness release audit ([[graft.operators.Privacy
    * .tClosenessClasses]] scaladoc — the skewness-attack audit
    * l-diversity misses: EMD-as-total-variation between each class's
    * sensitive distribution and the table's). Nation classes, market
    * segment sensitive, t = 1/10: measured emd spans 0.02–0.20 at
    * sf0.01 with the threshold inside the range, so both at_risk
    * states are load-bearing. The flag cross-multiplies exact
    * 128-bit integers; the reported emd is one fixed divide chain —
    * hash-exact. */
  val q218_t_closeness: Q = (s, d) =>
    graft.operators.Privacy.tClosenessClasses(Tables.customer(s, d),
      Seq(col("c_nationkey")), col("c_mktsegment"), tNum = 1, tDen = 10)

  val q218_oracle: String =
    """WITH cells AS (SELECT c_nationkey, c_mktsegment AS s,
           CAST(count(*) AS BIGINT) AS c
         FROM customer GROUP BY 1, 2),
       cls AS (SELECT c_nationkey, CAST(sum(c) AS BIGINT) AS class_size
         FROM cells GROUP BY 1),
       cat AS (SELECT s, CAST(sum(c) AS BIGINT) AS cs
         FROM cells GROUP BY 1),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       sc AS (SELECT cls.c_nationkey, cls.class_size, cat.s, cat.cs,
           tot.n, coalesce(cells.c, 0) AS c
         FROM cls CROSS JOIN cat CROSS JOIN tot
         LEFT JOIN cells ON cells.c_nationkey = cls.c_nationkey
           AND cells.s = cat.s),
       e AS (SELECT c_nationkey, class_size, n,
           sum(abs(CAST(c AS HUGEINT) * n
             - CAST(cs AS HUGEINT) * class_size)) AS num
         FROM sc GROUP BY 1, 2, 3)
       SELECT c_nationkey, class_size,
         CAST(num AS DOUBLE)
           / (2.0 * CAST(class_size AS DOUBLE) * CAST(n AS DOUBLE))
           AS emd,
         num * 10 > 2 * CAST(class_size AS HUGEINT) * n * 1 AS at_risk
       FROM e"""

  /** The q187/q191/q193 fixture: a "dirty" registry of the same
    * entities — each customer re-keyed +1000000 with name / acctbal /
    * mktsegment independently corrupted by md5 parity (the q108
    * synthesized-alias pattern applied to structured records);
    * c_nationkey is kept so true pairs co-block by construction. */
  private def dirtyCustomerTwin(cust: DataFrame): DataFrame = {
    def keep(salt: String) =
      substring(md5(concat(lit(salt), col("c_custkey").cast("string"))),
        1, 1) < "8"
    cust.select(
      (col("c_custkey") + 1000000L).as("c_custkey"),
      when(keep("nm:"), col("c_name"))
        .otherwise(concat(col("c_name"), lit("~"))).as("c_name"),
      col("c_nationkey"),
      when(keep("ab:"), col("c_acctbal"))
        .otherwise(col("c_acctbal") + 1.0).as("c_acctbal"),
      when(keep("mk:"), col("c_mktsegment"))
        .otherwise(lit("UNKNOWN")).as("c_mktsegment"))
  }

  /** Scaled log-odds weights shared by the linkage gates: name
    * ±24000/−8000, acctbal +10000/−5000, segment ±6000; thresholds
    * 13000 (possible) / 28000 (match). */
  private val linkageFields = Seq(
    graft.operators.Linkage.FieldRule("c_name", 24000L, -8000L),
    graft.operators.Linkage.FieldRule("c_acctbal", 10000L, -5000L),
    graft.operators.Linkage.FieldRule("c_mktsegment", 6000L, -6000L))

  /** q187: probabilistic record linkage
    * ([[graft.operators.Linkage.scorePairs]], Fellegi–Sunter) —
    * reconcile the customer table against a synthesized "dirty"
    * registry of the same entities (each customer re-keyed +1000000
    * with name / acctbal / mktsegment independently corrupted by md5
    * parity — the q108 synthesized-alias gate pattern applied to
    * structured records). Blocking on c_nationkey keeps true pairs
    * co-blocked by construction and turns all-pairs into a 25-block
    * equi-join; scores are exact long sums of scaled log-odds
    * weights (name ±24000/−8000, acctbal +10000/−5000, segment
    * ±6000), thresholded at 13000 (possible) / 28000 (match).
    * Unique names push every non-twin pair below the floor, so the
    * output is exactly the twins still recognizable from the
    * surviving fields — deterministic, and the oracle replays the
    * whole synthesis + scoring. */
  val q187_record_linkage: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    graft.operators.Linkage.scorePairs(cust, dirtyCustomerTwin(cust),
      "c_custkey", "c_custkey", Seq("c_nationkey"), linkageFields,
      minScore = 13000L, tMatch = 28000L)
  }

  val q187_oracle: String =
    """WITH dirty AS (SELECT c_custkey + 1000000 AS c_custkey,
         CASE WHEN substr(md5('nm:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_name ELSE c_name || '~' END AS c_name,
         c_nationkey,
         CASE WHEN substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_acctbal ELSE c_acctbal + 1.0 END AS c_acctbal,
         CASE WHEN substr(md5('mk:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_mktsegment ELSE 'UNKNOWN' END AS c_mktsegment
       FROM customer),
       scored AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
         CAST((CASE WHEN a.c_name = b.c_name THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END)
           AS BIGINT) AS n_agree,
         CAST((CASE WHEN a.c_name = b.c_name THEN 24000 ELSE -8000 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal
              THEN 10000 ELSE -5000 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment
              THEN 6000 ELSE -6000 END) AS BIGINT) AS score
       FROM customer a JOIN dirty b ON a.c_nationkey = b.c_nationkey)
       SELECT a_id, b_id, n_agree, score,
         CASE WHEN score >= 28000 THEN 'match' ELSE 'possible' END
           AS verdict
       FROM scored WHERE score >= 13000"""

  /** q191: incremental record linkage
    * ([[graft.operators.Linkage.scorePairsIncremental]]) — q187's
    * scoring applied the ingest way: a 10% dirty-twin DELTA linked
    * against the full customer registry with the delta broadcast, so
    * the registry is one exchange-free scan (plan-pinned in
    * LinkageSpec). Same synthesis, weights, and thresholds as q187;
    * the oracle is q187's restricted to the delta. */
  val q191_incremental_linkage: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val delta = dirtyCustomerTwin(
      cust.filter(col("c_custkey") % 10 === 0))
    graft.operators.Linkage.scorePairsIncremental(cust, delta,
      "c_custkey", "c_custkey", Seq("c_nationkey"), linkageFields,
      minScore = 13000L, tMatch = 28000L)
  }

  val q191_oracle: String =
    """WITH dirty AS (SELECT c_custkey + 1000000 AS c_custkey,
         CASE WHEN substr(md5('nm:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_name ELSE c_name || '~' END AS c_name,
         c_nationkey,
         CASE WHEN substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_acctbal ELSE c_acctbal + 1.0 END AS c_acctbal,
         CASE WHEN substr(md5('mk:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_mktsegment ELSE 'UNKNOWN' END AS c_mktsegment
       FROM customer WHERE c_custkey % 10 = 0),
       scored AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
         CAST((CASE WHEN a.c_name = b.c_name THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END)
           AS BIGINT) AS n_agree,
         CAST((CASE WHEN a.c_name = b.c_name THEN 24000 ELSE -8000 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal
              THEN 10000 ELSE -5000 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment
              THEN 6000 ELSE -6000 END) AS BIGINT) AS score
       FROM customer a JOIN dirty b ON a.c_nationkey = b.c_nationkey)
       SELECT a_id, b_id, n_agree, score,
         CASE WHEN score >= 28000 THEN 'match' ELSE 'possible' END
           AS verdict
       FROM scored WHERE score >= 13000"""

  /** q193: BLOCK-CAPPED record linkage — q187 with `maxBlock = 60`
    * BINDING at the gate SF (12 of 25 nation blocks exceed it at
    * sf0.01 and are dropped entirely): the LSH-maxBucket discipline
    * applied to blocking, gated the q95/q104 way — the oracle
    * recomputes the capped semantics (block census + the ≤60 join
    * condition), so the 100 TB degenerate-block path is what
    * hash-matches, not just the happy path. */
  val q193_linkage_capped: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    graft.operators.Linkage.scorePairs(cust, dirtyCustomerTwin(cust),
      "c_custkey", "c_custkey", Seq("c_nationkey"), linkageFields,
      minScore = 13000L, tMatch = 28000L, maxBlock = 60)
  }

  val q193_oracle: String =
    """WITH dirty AS (SELECT c_custkey + 1000000 AS c_custkey,
         CASE WHEN substr(md5('nm:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_name ELSE c_name || '~' END AS c_name,
         c_nationkey,
         CASE WHEN substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_acctbal ELSE c_acctbal + 1.0 END AS c_acctbal,
         CASE WHEN substr(md5('mk:' || CAST(c_custkey AS VARCHAR)), 1, 1)
                < '8' THEN c_mktsegment ELSE 'UNKNOWN' END AS c_mktsegment
       FROM customer),
       bs AS (SELECT c_nationkey, count(*) AS bn
         FROM customer GROUP BY 1),
       scored AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
         CAST((CASE WHEN a.c_name = b.c_name THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal THEN 1 ELSE 0 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END)
           AS BIGINT) AS n_agree,
         CAST((CASE WHEN a.c_name = b.c_name THEN 24000 ELSE -8000 END)
           + (CASE WHEN a.c_acctbal = b.c_acctbal
              THEN 10000 ELSE -5000 END)
           + (CASE WHEN a.c_mktsegment = b.c_mktsegment
              THEN 6000 ELSE -6000 END) AS BIGINT) AS score
       FROM customer a
       JOIN bs ON bs.c_nationkey = a.c_nationkey AND bs.bn <= 60
       JOIN dirty b ON a.c_nationkey = b.c_nationkey)
       SELECT a_id, b_id, n_agree, score,
         CASE WHEN score >= 28000 THEN 'match' ELSE 'possible' END
           AS verdict
       FROM scored WHERE score >= 13000"""

  /** q207: l-diversity release audit
    * ([[graft.operators.Privacy.lDiversityClasses]] scaladoc — the
    * homogeneity-attack check k-anonymity misses). Quasi-identifiers
    * (nation, floor(acctbal/2000)) against the market segment as the
    * sensitive attribute at l=3: the ~150-class space over small-SF
    * row counts leaves genuinely homogeneous classes (measured: 87 of
    * 93 at sf0.001, 3 of 125 at sf0.01), so the flag is load-bearing.
    * The bucket edge uses floor of one correctly-rounded double
    * division — identical in both engines (a raw double→long CAST
    * would round in DuckDB and truncate in Spark). */
  val q207_l_diversity: Q = (s, d) =>
    graft.operators.Privacy.lDiversityClasses(Tables.customer(s, d),
      Seq(col("c_nationkey"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_band")),
      col("c_mktsegment"), l = 3)

  val q207_oracle: String =
    """SELECT c_nationkey,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
         count(DISTINCT c_mktsegment) < 3 AS at_risk
       FROM customer GROUP BY 1, 2"""

  /** q210: A/B significance readout ([[graft.operators.Stats
    * .chiSquare2x2]] scaladoc — per-group Pearson χ² over the 2×2
    * variant×success table; the cross-product difference forms
    * exactly in 128-bit integers, decimal(38) here / HUGEINT in the
    * oracle, then one fixed double multiply/divide tree). Units are
    * orders, variant = customer-key parity, success = urgent
    * priority, grouped by order status. At the 90% critical value
    * 2.7055 the flag fires for status F at sf0.001 (χ² = 3.03) and
    * nowhere at sf0.01 — the decision varies with the data, and the
    * χ² VALUE itself gates hash-exact at every SF. */
  val q210_ab_chi2: Q = (s, d) =>
    graft.operators.Stats.chiSquare2x2(Tables.orders(s, d),
      "o_orderstatus",
      (col("o_custkey") % 2).cast("long"),
      (col("o_orderpriority") === "1-URGENT").cast("long"),
      critical = 2.705543454095404)

  val q210_oracle: String =
    """WITH agg AS (SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_custkey % 2 = 0
             AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS n00,
         CAST(sum(CASE WHEN o_custkey % 2 = 0
             AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS n01,
         CAST(sum(CASE WHEN o_custkey % 2 = 1
             AND o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS n10,
         CAST(sum(CASE WHEN o_custkey % 2 = 1
             AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS BIGINT) AS n11
       FROM orders GROUP BY 1),
     st AS (SELECT *,
         CAST(CAST(n11 AS HUGEINT) * n00
           - CAST(n10 AS HUGEINT) * n01 AS DOUBLE) AS diff,
         (CAST(n00 + n01 AS DOUBLE) * CAST(n10 + n11 AS DOUBLE))
           * (CAST(n00 + n10 AS DOUBLE) * CAST(n01 + n11 AS DOUBLE))
           AS den
       FROM agg)
     SELECT o_orderstatus, n00, n01, n10, n11,
       CASE WHEN den > 0 THEN
         CAST(n00 + n01 + n10 + n11 AS DOUBLE) * diff * diff / den
       END AS chi2,
       CASE WHEN den > 0 THEN
         CAST(n00 + n01 + n10 + n11 AS DOUBLE) * diff * diff / den
           > 2.705543454095404
       END AS significant
     FROM st"""

  val all: Map[String, Q] = Map(
    "q210_ab_chi2" -> q210_ab_chi2,
    "q207_l_diversity" -> q207_l_diversity,
    "q218_t_closeness" -> q218_t_closeness,
    "q193_linkage_capped" -> q193_linkage_capped,
    "q191_incremental_linkage" -> q191_incremental_linkage,
    "q187_record_linkage" -> q187_record_linkage,
    "q159_edit_join" -> q159_edit_join,
    "q163_k_anonymity" -> q163_k_anonymity,
    "q80_scd2_history" -> q80_scd2_history,
    "q61_outer_join" -> q61_outer_join,
    "q62_window_nav" -> q62_window_nav,
    "q59_setops_all" -> q59_setops_all,
    "q60_unpivot" -> q60_unpivot,
    "q57_scalar_subquery" -> q57_scalar_subquery,
    "q48_pivot" -> q48_pivot,
    "q49_percentiles" -> q49_percentiles,
    "q50_date_arith" -> q50_date_arith,
    "q47_cube" -> q47_cube,
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_filter_project" -> q02_filter_project,
    "q03_top_orders" -> q03_top_orders,
    "q04_order_priority" -> q04_order_priority,
    "q05_region_revenue" -> q05_region_revenue,
    "q06_revenue_filter" -> q06_revenue_filter,
    "q07_brand_volume" -> q07_brand_volume,
    "q08_cust_without_orders" -> q08_cust_without_orders,
    "q09_window_rank" -> q09_window_rank,
    "q10_running_total" -> q10_running_total,
    "q11_rollup" -> q11_rollup,
    "q12_grouping_sets" -> q12_grouping_sets,
    "q13_topk_orders" -> q13_topk_orders,
    "q14_distinct_agg" -> q14_distinct_agg,
    "q15_setops" -> q15_setops,
    "q16_string_funcs" -> q16_string_funcs,
    "q17_date_funcs" -> q17_date_funcs,
    "q18_case_math" -> q18_case_math,
    "q76_merge_upsert" -> q76_merge_upsert)

  val oracles: Map[String, String] = Map(
    "q193_linkage_capped" -> q193_oracle,
    "q191_incremental_linkage" -> q191_oracle,
    "q187_record_linkage" -> q187_oracle,
    "q159_edit_join" -> q159_oracle,
    "q163_k_anonymity" -> q163_oracle,
    "q207_l_diversity" -> q207_oracle,
    "q218_t_closeness" -> q218_oracle,
    "q210_ab_chi2" -> q210_oracle,
    "q80_scd2_history" -> q80_oracle,
    "q61_outer_join" -> q61_oracle,
    "q62_window_nav" -> q62_oracle,
    "q59_setops_all" -> q59_oracle,
    "q60_unpivot" -> q60_oracle,
    "q57_scalar_subquery" -> q57_oracle,
    "q48_pivot" -> q48_oracle,
    "q49_percentiles" -> q49_oracle,
    "q50_date_arith" -> q50_oracle,
    "q47_cube" -> q47_oracle,
    "q01_pricing_summary" -> q01_oracle,
    "q02_filter_project" -> q02_oracle,
    "q03_top_orders" -> q03_oracle,
    "q04_order_priority" -> q04_oracle,
    "q05_region_revenue" -> q05_oracle,
    "q06_revenue_filter" -> q06_oracle,
    "q07_brand_volume" -> q07_oracle,
    "q08_cust_without_orders" -> q08_oracle,
    "q09_window_rank" -> q09_oracle,
    "q10_running_total" -> q10_oracle,
    "q11_rollup" -> q11_oracle,
    "q12_grouping_sets" -> q12_oracle,
    "q13_topk_orders" -> q13_oracle,
    "q14_distinct_agg" -> q14_oracle,
    "q15_setops" -> q15_oracle,
    "q16_string_funcs" -> q16_oracle,
    "q17_date_funcs" -> q17_oracle,
    "q18_case_math" -> q18_oracle,
    "q76_merge_upsert" -> q76_oracle)

}
