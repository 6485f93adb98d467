package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives the fixture sizes don't force but 100 TB does:
  * salting for skewed join keys and bucketing for co-located
  * (shuffle-free) joins. Both are semantic no-ops — results identical to
  * the plain operator — with the data movement restructured; tests assert
  * both the equivalence and the plan shape.
  */
object Scale {

  /** Equi-join where `skewed`'s key distribution has hot keys: spread
    * each hot row across `salts` sub-keys and replicate the build side
    * per salt, so one hot key occupies `salts` tasks instead of one.
    * (AQE's skew-join handles sort-merge cases adaptively; explicit
    * salting also covers hash joins and pre-AQE engines, and composes
    * with bucketing.) Inner join only. */
  def saltedJoin(skewed: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 1)
    // deterministic per-row salt: hash of the whole row spreads hot keys
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(salts))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Write both sides bucketed+sorted on the join key so the later join
    * needs no exchange at all (bucket-local sort-merge). The managed-
    * table requirement is Spark's: bucket metadata lives in the catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans with zero
    * Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Interleave the low 32 bits of two non-negative integer columns
    * into a 64-bit Morton (z-order) value: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Pure builtin bit ops — five
    * mask-shift spreads per column, all inside whole-stage codegen. */
  def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(c: org.apache.spark.sql.Column) = {
      val masks = Seq(
        (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
        (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
        (1, 0x5555555555555555L))
      masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
        case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` z-ordered on two dimensions: range-partition + sort by
    * the interleaved Morton value, so every output file covers a small
    * RECTANGLE in (a, b) space instead of a thin stripe in one
    * dimension. Parquet min/max stats on BOTH columns then prune
    * row-groups for predicates on either dimension — the multi-column
    * data-skipping layout a single-column sort cannot give (sorting by
    * `a` leaves each file spanning the full range of `b`). */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
      dir: String, numFiles: Int): Unit = {
    df.withColumn("__z", zValue(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
