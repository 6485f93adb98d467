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

  test("latestSnapshot keeps exactly the last writer per key and drops " +
      "tombstoned keys, independent of input partitioning") {
    val log = Seq(
      (1L, 1, "v1", "put"), (1L, 3, "v3", "put"), (1L, 2, "v2", "put"),
      (2L, 1, "w1", "put"), (2L, 2, null: String, "del"),
      (3L, 5, "x5", "put")).toDF("k", "ts", "v", "op")
    val snap = Merge.latestSnapshot(log.repartition(5), Seq("k"),
      Seq("ts"), deleteWhen = Some($"op" === "del"))
      .select($"k", $"v").as[(Long, String)].collect().sortBy(_._1)
    assert(snap.toSeq == Seq((1L, "v3"), (3L, "x5")))
    // without delete semantics the tombstone row itself surfaces
    val all = Merge.latestSnapshot(log, Seq("k"), Seq("ts"))
      .select($"k", $"op").as[(Long, String)].collect().toSet
    assert(all == Set((1L, "put"), (2L, "del"), (3L, "put")))
  }

  test("applyScd2 drops no-op changes, closes versions with their " +
      "successor, and flags exactly one current row per key") {
    val log = Seq(
      (1L, 1, "A"), (1L, 2, "A"), (1L, 3, "B"), (1L, 4, "B"), (1L, 5, "A"),
      (2L, 1, "X")).toDF("k", "ts", "status")
    val hist = Merge.applyScd2(log, Seq("k"), Seq("ts"), Seq("status"))
      .select($"k", $"status", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Int, Option[Int], Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(hist == Seq(
      (1L, "A", 1, Some(3), false),
      (1L, "B", 3, Some(5), false),
      (1L, "A", 5, None, true),
      (2L, "X", 1, None, true)))
    // exactly one current version per key, valid ranges abut
    val current = hist.filter(_._5)
    assert(current.map(_._1).toSet == Set(1L, 2L))
  }

  test("applyScd2 keeps a key's first version even when its initial " +
      "tracked value is null") {
    val log = Seq(
      (1L, 1, null: String), (1L, 2, "A"),
      (2L, 1, null: String), (2L, 2, null: String)).toDF("k", "ts", "v")
    val hist = Merge.applyScd2(log, Seq("k"), Seq("ts"), Seq("v"))
      .select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Option[String], Int, Option[Int], Boolean)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(hist == Seq(
      (1L, None, 1, Some(2), false),       // null period is real history
      (1L, Some("A"), 2, None, true),
      (2L, None, 1, None, true)))          // all-null key still exists
  }

  test("mergeInto raises on duplicate source keys instead of silently " +
      "multiplying the target row (Delta/Iceberg MERGE contract)") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dupSource = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("id", "v")
    val e = intercept[Exception] {
      Merge.mergeInto(target, dupSource, Seq("id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("multiple source rows")),
      s"unexpected failure: $e")
    // a unique source with the same shape still merges fine
    val ok = Merge.mergeInto(target,
      Seq((1L, "x"), (3L, "z")).toDF("id", "v"), Seq("id"))
    assert(ok.orderBy($"id").as[(Long, String)].collect().toSeq
      == Seq((1L, "x"), (2L, "b"), (3L, "z")))
  }

  test("mergeInto: null-key source rows are independent inserts, never " +
      "duplicates — the equi-join can't match them (ADVICE r06: the " +
      "guard used to raise on a changeset with two null-key inserts)") {
    val target = Seq((Some(1L), "a")).toDF("id", "v")
    // two all-null-key rows + one normal update: must NOT raise
    val s = Seq((None, "n1"), (None, "n2"), (Some(1L), "x"))
      .toDF("id", "v")
    val out = Merge.mergeInto(target, s, Seq("id"))
      .as[(Option[Long], String)].collect().toSeq
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
    // both null-key rows inserted; the matched key updated
    assert(out == Seq((None, "n1"), (None, "n2"), (Some(1L), "x")))
    // duplicate NON-null keys still raise
    val e = intercept[Exception] {
      Merge.mergeInto(target,
        Seq((Some(2L), "p"), (Some(2L), "q")).toDF("id", "v"),
        Seq("id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("multiple source rows")))
  }

  test("mergeInto's deleteWhen may reference source-only columns (the " +
      "CDC op marker), which never leak into the output") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val s = Seq((2L, "b2", "U"), (1L, "x", "D"), (3L, "c", "U"))
      .toDF("id", "v", "op")
    val merged = Merge.mergeInto(t, s, Seq("id"),
      deleteWhen = Some($"op" === "D"))
    assert(merged.columns.toSeq == Seq("id", "v"))
    assert(merged.as[(Long, String)].collect().sortBy(_._1).toSeq
      == Seq((2L, "b2"), (3L, "c")))
  }

  test("randomized model check: mergeInto, latestSnapshot, and applyScd2 " +
      "agree with a brute-force in-memory model across 5 seeded logs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // a change log over 8 keys with ts-unique rows and ~15% deletes
      val log = (1 to 60).map { ts =>
        (rnd.nextInt(8).toLong, ts,
          if (rnd.nextInt(10) < 2) null
          else ('A' + rnd.nextInt(3)).toChar.toString,
          rnd.nextInt(100) < 15)
      }
      val df = log.toDF("k", "ts", "v", "del")

      // --- latestSnapshot vs model
      val model = log.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._2)
      }
      val snap = Merge.latestSnapshot(df, Seq("k"), Seq("ts"),
          deleteWhen = Some($"del"))
        .select($"k", $"ts").as[(Long, Int)].collect().toMap
      model.foreach { case (k, (_, ts, _, del)) =>
        if (del) assert(!snap.contains(k), s"seed $seed key $k")
        else assert(snap(k) == ts, s"seed $seed key $k")
      }

      // --- applyScd2 vs model (version list per key)
      val hist = Merge.applyScd2(df, Seq("k"), Seq("ts"), Seq("v"))
        .select($"k", $"v", $"valid_from", $"valid_to")
        .as[(Long, Option[String], Int, Option[Int])].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap
      log.groupBy(_._1).foreach { case (k, rows) =>
        val ordered = rows.sortBy(_._2)
        val versions = ordered.foldLeft(Vector.empty[(Option[String], Int)]) {
          case (acc, (_, ts, v, _)) =>
            if (acc.isEmpty || acc.last._1 != Option(v))
              acc :+ (Option(v), ts)
            else acc
        }
        val expected = versions.zipAll(versions.drop(1).map(_._2), null, -1)
          .map { case ((v, from), to) =>
            (k, v, from, if (to == -1) None else Some(to)) }
        assert(hist(k) == expected, s"seed $seed key $k")
      }

      // --- mergeInto round-trip: applying the log's final state as a
      // changeset onto an empty-ish target reproduces the snapshot
      val target = df.filter($"ts" <= 0).select($"k", $"ts", $"v", $"del")
      val source = Merge.latestSnapshot(df, Seq("k"), Seq("ts"))
      val merged = Merge.mergeInto(target, source, Seq("k"),
        deleteWhen = Some($"del"))
        .select($"k", $"ts").as[(Long, Int)].collect().toMap
      assert(merged == snap, s"seed $seed")
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
