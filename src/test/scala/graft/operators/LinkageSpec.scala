package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSuite {
  import spark.implicits._
  import Linkage.FieldRule

  // (id, block, name, city, age)
  private lazy val left = Seq(
    (1L, "b1", "alice", "york", 30L),
    (2L, "b1", "bob", "kent", 41L),
    (3L, "b2", "carol", "bath", 28L),
    (4L, "b2", "dave", "hull", 55L)
  ).toDF("id", "blk", "name", "city", "age")

  // twins of 1/3 with one corrupted field each, one unrelated record,
  // and a twin of 2 in the WRONG block (blocking miss, by design)
  private lazy val right = Seq(
    (11L, "b1", "alice", "york", 31L),   // age off -> still match
    (13L, "b2", "carol", "oxon", 28L),   // city off -> still match
    (14L, "b2", "zed", "hull", 55L),     // name off -> possible
    (15L, "b2", "pete", "ryde", 19L),    // unrelated
    (12L, "b9", "bob", "kent", 41L)      // right twin, wrong block
  ).toDF("id", "blk", "name", "city", "age")

  private val fields = Seq(FieldRule("name", 20L, -10L),
    FieldRule("city", 8L, -4L), FieldRule("age", 6L, -3L))

  test("scorePairs sums exact agreement weights per blocked pair, " +
      "classifies by threshold, and never compares across blocks") {
    val got = Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, minScore = 5L, tMatch = 20L)
      .select($"a_id", $"b_id", $"n_agree", $"score", $"verdict")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // twins with one corrupted field score wAgree+wAgree-wDisagree
    assert(got((1L, 11L)) == ((1L, 11L, 2L, 25L, "match")))
    assert(got((3L, 13L)) == ((3L, 13L, 2L, 22L, "match")))
    // name corrupted: 8+6-10 = 4 < minScore=5 would drop it; widen
    // via the thresholds below — here it is absent
    assert(!got.contains((4L, 14L)))
    // unrelated same-block pairs all fall below the floor
    assert(!got.keys.exists(_._2 == 15L))
    // a twin in another block is NEVER compared (that is what
    // blocking means — recall is the blocking key's job)
    assert(!got.keys.exists(_._2 == 12L))
    // lowering the floor surfaces the name-corrupted twin as possible
    val loose = Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, minScore = 4L, tMatch = 20L)
      .select($"a_id", $"b_id", $"verdict")
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(loose((4L, 14L)) == "possible")
  }

  test("null fields agree only with null (null-safe comparison) but " +
      "a null BLOCK yields no candidates (strict join — no missing-" +
      "key mega-block)") {
    val a = Seq((1L, Option("b"), Option.empty[String], "x"),
      (2L, Option("b"), Option("n"), "x"),
      (3L, Option.empty[String], Option("n"), "x"))
      .toDF("id", "blk", "name", "city")
    val b = Seq((11L, Option("b"), Option.empty[String], "x"),
      (12L, Option("b"), Option("m"), "x"),
      (13L, Option.empty[String], Option("n"), "x"))
      .toDF("id", "blk", "name", "city")
    val rules = Seq(FieldRule("name", 10L, -5L), FieldRule("city", 4L, -2L))
    val got = Linkage.scorePairs(a, b, "id", "id", Seq("blk"), rules,
        minScore = -1000L, tMatch = 14L)
      .select($"a_id", $"b_id", $"score")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 11L)) == 14L) // null <=> null agrees
    assert(got((1L, 12L)) == -1L) // null vs 'm' disagrees
    assert(got((2L, 11L)) == -1L)
    assert(got((2L, 12L)) == -1L) // 'n' vs 'm' disagrees
    // identical rows with null blocks are NOT candidates
    assert(!got.keys.exists(k => k._1 == 3L || k._2 == 13L))
  }

  test("scorePairsIncremental == scorePairs on the same inputs, and " +
      "the registry side NEVER shuffles (delta broadcast; zero hash " +
      "exchanges — the q82/q150 incremental contract)") {
    val full = Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, 4L, 20L)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val incr = Linkage.scorePairsIncremental(left, right, "id", "id",
        Seq("blk"), fields, 4L, 20L)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(incr == full)
    val plan = Linkage.scorePairsIncremental(left, right, "id", "id",
        Seq("blk"), fields, 4L, 20L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"registry fed an exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("maxBlock drops over-populated blocks ENTIRELY (the LSH " +
      "maxBucket discipline): a binding cap removes the big block's " +
      "pairs including its true twins, leaves other blocks untouched, " +
      "and the default is the uncapped identity") {
    // b2 has 2 registry rows, b1 has 2 — cap 1 drops BOTH blocks'
    // pairs; cap 2 keeps everything (same as default)
    val capped = Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, 4L, 20L, maxBlock = 1)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(capped.isEmpty, capped.toString)
    // a mixed fixture: one singleton block survives a cap of 1
    val bigLeft = left.union(Seq((5L, "b3", "eve", "cork", 33L))
      .toDF("id", "blk", "name", "city", "age"))
    val bigRight = right.union(Seq((16L, "b3", "eve", "cork", 34L))
      .toDF("id", "blk", "name", "city", "age"))
    val mixed = Linkage.scorePairs(bigLeft, bigRight, "id", "id",
        Seq("blk"), fields, 4L, 20L, maxBlock = 1)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(mixed == Set((5L, 16L)), mixed.toString)
    val dflt = Linkage.scorePairs(bigLeft, bigRight, "id", "id",
        Seq("blk"), fields, 4L, 20L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val cap99 = Linkage.scorePairs(bigLeft, bigRight, "id", "id",
        Seq("blk"), fields, 4L, 20L, maxBlock = 99)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(cap99 == dflt)
    intercept[IllegalArgumentException] {
      Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, 4L, 20L, maxBlock = 0)
    }
  }

  test("the blocked join is an equi-join — no cartesian / broadcast " +
      "NLJ anywhere in the plan — and weights are sanity-guarded") {
    val plan = Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
      fields, 5L, 20L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    intercept[IllegalArgumentException] {
      Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        Seq(FieldRule("name", 1L, 2L)), 0L, 0L)
    }
    intercept[IllegalArgumentException] {
      Linkage.scorePairs(left, right, "id", "id", Seq("blk"),
        fields, minScore = 10L, tMatch = 5L)
    }
  }
}
