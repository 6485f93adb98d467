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

  test("z-ordered layout bounds BOTH dimensions per file where a " +
      "single-column sort leaves the second dimension unbounded") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), dayofmonth(col("ts")).as("day"), col("event_id"))
    def perFileRanges(dir: String): Seq[(Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("user_id")) - min(col("user_id")),
            max(col("day")) - min(col("day"))).head()
        (r.getLong(0), r.getAs[Number](1).longValue())
      }
    }
    val zDir = tempDir("zorder-")
    Scale.writeZOrdered(ev, "user_id", "day", zDir, numFiles = 8)
    val sortDir = tempDir("usersort-")
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(sortDir)
    val zRanges = perFileRanges(zDir)
    val sRanges = perFileRanges(sortDir)
    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    val zUser = avg(zRanges.map(_._1)); val zDay = avg(zRanges.map(_._2))
    val sUser = avg(sRanges.map(_._1)); val sDay = avg(sRanges.map(_._2))
    // single-col sort: tight on user, but every file spans ~all days
    assert(sDay > 25, s"user-sorted day range $sDay")
    // z-order: BOTH dimensions bounded well below their global spreads
    assert(zUser < 149 * 0.6, s"z user range $zUser")
    assert(zDay < sDay * 0.6, s"z day range $zDay vs sorted $sDay")
    // same rows either way
    assert(spark.read.parquet(zDir).count() == ev.count())
    // z-value is the documented interleave on a known example:
    // a=0b101 (bits at 0,4), b=0b11 (bits at 1,3) -> 0b011011 wrong?
    val z = spark.range(1).select(
      Scale.zValue(lit(5), lit(3)).as("z")).head().getLong(0)
    // a=5=0b101 -> even bits 0,4; b=3=0b11 -> odd bits 1,3 => 0b011011 = 27
    assert(z == 27L, s"zValue(5,3)=$z")
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
