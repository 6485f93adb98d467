package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares our results against DuckDB.
  * Double-precision SUMs are order-dependent (Spark accumulates per
  * partition, DuckDB sequentially), so any `sum(double)` can differ in the
  * last ulp and fail a hash compare. The fix: cast the 2-decimal fixture
  * measures to exact DECIMAL before aggregating — decimal addition is
  * associative and exact — then cast the final aggregate back to DOUBLE.
  * Both engines then produce bit-identical doubles.
  *
  * Precisions are chosen so products never exceed either engine's 38-digit
  * cap (DuckDB silently switches to DOUBLE above 38; Spark reduces scale):
  * money(12,2) * rate(5,2) * rate(5,2) tops out at 24 digits.
  */
object Sql {
  /** money-valued column (prices, balances, quantities ≤ 1e10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small rate-valued column (discount, tax ∈ [0,100)). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** literal 1 as a rate, for (1 - discount)-style factors. */
  val one: Column = lit(1).cast(DecimalType(4, 2))

  /** Exact sum of a 2-dp double column, returned as a bit-stable double. */
  def dsum(c: Column): Column = sum(money(c)).cast("double")
  /** Bit-stable mean: exact decimal sum, then IEEE double division. */
  def davg(c: Column): Column = sum(money(c)).cast("double") / count(c)
  /** revenue term l_extendedprice * (1 - l_discount), exact. */
  def discPrice(price: Column, disc: Column): Column =
    money(price) * (one - rate(disc))
  /** charge term price * (1-disc) * (1+tax), exact. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    money(price) * (one - rate(disc)) * (one + rate(tax))

  /** DuckDB SQL fragments mirroring the helpers above, for oracle strings. */
  object duck {
    def money(c: String): String = s"CAST($c AS DECIMAL(12,2))"
    def rate(c: String): String = s"CAST($c AS DECIMAL(4,2))"
    val one: String = "CAST(1 AS DECIMAL(4,2))"
    def dsum(c: String): String = s"CAST(sum(${money(c)}) AS DOUBLE)"
    def davg(c: String): String = s"CAST(sum(${money(c)}) AS DOUBLE) / count($c)"
    def discPrice(p: String, d: String): String =
      s"${money(p)} * ($one - ${rate(d)})"
    def charge(p: String, d: String, t: String): String =
      s"${money(p)} * ($one - ${rate(d)}) * ($one + ${rate(t)})"
  }
}
