package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = graft.Tables.orders(spark, sfDir)

  test("mergeInto covers update, insert, delete, and pass-through " +
      "against a same-table CDC changeset") {
    val target = orders.filter($"o_orderkey" % 3 =!= 0)
    val source = orders.filter($"o_orderkey" % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", $"o_totalprice" * 2)
    val merged = Merge.mergeInto(target, source, Seq("o_orderkey"),
      deleteWhen = Some($"o_orderpriority" === "1-URGENT"))
    assert(merged.columns.toSeq == orders.columns.toSeq)

    val m = merged.select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    val orig = orders
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
      .as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    orig.foreach { case (k, (_, st, price, prio)) =>
      val inT = k % 3 != 0
      val inS = k % 2 == 0
      val deleted = inS && prio == "1-URGENT"
      if (deleted) assert(!m.contains(k), s"delete marker must drop $k")
      else if (inS) // update or insert: source values win
        assert(m(k) == ((k, "U", price * 2)), s"source must win for $k")
      else if (inT) // untouched target row passes through
        assert(m(k) == ((k, st, price)), s"target must pass through $k")
      else assert(!m.contains(k), s"$k is in neither side")
    }
  }

  test("mergeInto validates keys and source columns") {
    intercept[IllegalArgumentException] {
      Merge.mergeInto(orders, orders, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Merge.mergeInto(orders, orders.drop("o_custkey"), Seq("o_orderkey"))
    }
  }

  test("a null deleteWhen evaluation means keep (no silent row loss)") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val s = Seq((2L, null: String), (3L, "c")).toDF("id", "v")
    val merged = Merge.mergeInto(t, s, Seq("id"),
      deleteWhen = Some($"v" === "never")) // null === 'never' is null
      .as[(Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq == Seq((1L, "a"), (2L, null), (3L, "c")))
  }
}
