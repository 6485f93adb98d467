package graft.expressions

import graft.SparkSuite
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** r18: the rerank hot path moved from array_intersect /
  * aggregate(map_zip_with) to the SortedMerge kernels. These pin the
  * drop-in identity on randomized inputs, including the empty/disjoint
  * and duplicate-count edges. */
class SetExprsSpec extends SparkSuite {
  import spark.implicits._

  test("sortedIntersectCount == size(array_intersect) on sorted " +
      "duplicate-free string arrays (randomized + edges)") {
    val rnd = new scala.util.Random(7)
    def randSet(): Seq[String] =
      rnd.shuffle((0 until 40).map(i => s"tok${rnd.nextInt(60)}"))
        .distinct.sorted
    val rows = (1 to 200).map(i => (i.toLong, randSet(), randSet())) ++
      Seq((201L, Seq.empty[String], Seq("a", "b")),
        (202L, Seq("a", "b"), Seq.empty[String]),
        (203L, Seq("x"), Seq("y")), // disjoint
        (204L, Seq("a", "b", "c"), Seq("a", "b", "c"))) // identical
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        sortedIntersectCount($"a", $"b").as("nw"),
        size(array_intersect($"a", $"b")).cast("long").as("od"))
      .filter($"nw" =!= $"od").count()
    assert(bad == 0L)
  }

  test("sortedEntriesDot == aggregate(map_zip_with) fold over the same " +
      "posting lists") {
    val rnd = new scala.util.Random(11)
    def postings(): Seq[(String, Long)] =
      (0 until 30).map(i => s"g${rnd.nextInt(40)}")
        .distinct.sorted.map(g => (g, (rnd.nextInt(9) + 1).toLong))
    val rows = (1 to 150).map(i => (i.toLong, postings(), postings())) ++
      Seq((151L, Seq.empty[(String, Long)], Seq(("a", 2L))),
        (152L, Seq(("a", 3L)), Seq(("a", 4L))))
    val df = rows.toDF("id", "ea", "eb")
      .select($"id",
        $"ea".cast("array<struct<key:string,cnt:bigint>>").as("ea"),
        $"eb".cast("array<struct<key:string,cnt:bigint>>").as("eb"))
    val withMaps = df
      .withColumn("ma", map_from_entries($"ea"))
      .withColumn("mb", map_from_entries($"eb"))
      .withColumn("nw", sortedEntriesDot($"ea", $"eb"))
      .withColumn("od", coalesce(aggregate(
        map_values(map_zip_with($"ma", $"mb",
          (_, a, b) => coalesce(a, lit(0L)) * coalesce(b, lit(0L)))),
        lit(0L), (acc, x) => acc + x), lit(0L)))
    // empty-map edge: map_zip_with of an empty side yields the other
    // side's keys with null products coalesced to 0 — dot 0 both ways
    assert(withMaps.filter($"nw" =!= $"od").count() == 0L)
  }

  test("null ARRAY ELEMENTS refuse loudly in every merge-walk kernel " +
      "(ADVICE r18: getLong silently reads a null slot as 0)") {
    // string walk: null element visited by the walk → throw
    val s = Seq((1L, Seq[String]("a", null, "c"), Seq("a", "b", "c")))
      .toDF("id", "a", "b")
    val e1 = intercept[Exception] {
      s.select(sortedIntersectCount($"a", $"b")).collect()
    }
    assert(e1.getMessage.contains("null array element") ||
      e1.getCause != null &&
        e1.getCause.getMessage.contains("null array element"))
    // long walk: the silent-zero case the guard exists for
    val l = Seq((1L, Seq[java.lang.Long](1L, null, 9L),
        Seq[java.lang.Long](0L, 1L, 9L))).toDF("id", "a", "b")
    val e2 = intercept[Exception] {
      l.select(sortedLongIntersectCount($"a", $"b")).collect()
    }
    assert(e2.getMessage.contains("null array element") ||
      e2.getCause != null &&
        e2.getCause.getMessage.contains("null array element"))
    // UNVISITED trailing elements stay out of contract: the walk ends
    // when one side exhausts, so a trailing null cannot change the
    // count and must not throw
    val ok = Seq((1L, Seq[java.lang.Long](1L),
        Seq[java.lang.Long](1L, null))).toDF("id", "a", "b")
      .select(sortedLongIntersectCount($"a", $"b")).head().getLong(0)
    assert(ok == 1L)
  }
}
