package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CoGroupSpec extends SparkSuite {
  import spark.implicits._

  test("typed cogroup builds per-customer timelines: one header per " +
      "customer, orders in date order with dense sequence numbers") {
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_name").as[(Long, String)]
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
      .as[(Long, java.sql.Timestamp, Double)]
    val tl = CoGroup.customerTimeline(customers, orders).cache()

    val nCust = customers.count()
    assert(tl.filter($"kind" === "customer").count() == nCust)
    assert(tl.filter($"kind" === "order").count() == orders.count())
    // per key: seq is dense 0..n
    val bad = tl.groupBy($"custkey")
      .agg(count(lit(1)).as("n"), max($"seq").as("mx"))
      .filter($"mx" =!= $"n" - 1).count()
    assert(bad == 0)
    // spot-check one customer's order sequence is date-ordered
    val k = orders.head()._1
    val seqs = tl.filter($"custkey" === k && $"kind" === "order")
      .orderBy($"seq").select($"detail").as[String].collect()
    val expected = orders.filter(_._1 == k).collect()
      .sortBy(o => (o._2.getTime, o._3)).map(o => f"${o._3}%.2f")
    assert(seqs.toSeq == expected.toSeq)
  }
}
