package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Equivalence + plan-shape tests for the scale primitives. */
class ScaleSpec extends SparkSuite {

  test("salted join returns exactly the plain join's rows and " +
      "partitions on (key, salt)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = Scale.saltedJoin(orders, customer, Seq("o_custkey"),
      salts = 8)
    assert(salted.count() == plain.count())
    val key = Seq("o_orderkey", "c_name")
    assert(salted.select(key.map(col): _*).collect().toSet ==
      plain.select(key.map(col): _*).collect().toSet)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt") || p.contains("BroadcastHashJoin"), p)
  }

  test("bucketed join on the bucket key plans without any exchange") {
    Scale.writeBucketed(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      "orders_b", "o_custkey", buckets = 8)
    Scale.writeBucketed(
      spark.read.parquet(s"$sfDir/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", buckets = 8)
    val joined = Scale.bucketedJoin(spark, "orders_b", "customer_b",
      "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // results match the unbucketed join
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
    assert(joined.count() == plain.count())
  }
}
