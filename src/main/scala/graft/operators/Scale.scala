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
}
