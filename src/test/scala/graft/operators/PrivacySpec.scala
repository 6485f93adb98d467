package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** k-anonymity census + exact order-statistic quantiles. */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  private lazy val people = Seq(
    ("us", "a"), ("us", "a"), ("us", "a"), ("us", "a"), ("us", "a"),
    ("us", "b"), ("us", "b"),
    ("fr", "a")
  ).toDF("country", "tier")

  test("kAnonymityClasses: class sizes and the k flag") {
    val got = Privacy.kAnonymityClasses(people,
        Seq(col("country"), col("tier")), k = 5)
      .select($"country", $"tier", $"class_size", $"at_risk")
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("us", "a", 5L, false), ("us", "b", 2L, true),
      ("fr", "a", 1L, true)))
  }

  test("kAnonymitySummary: risk record count and fraction") {
    val got = Privacy.kAnonymitySummary(people,
        Seq(col("country"), col("tier")), k = 5)
      .select($"n_classes", $"n_records", $"risk_classes",
        $"risk_records", $"risk_fraction")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((3L, 8L, 2L, 3L, 3.0 / 8)))
  }

  test("lDiversityClasses: a LARGE but homogeneous class is flagged " +
      "(the homogeneity attack k-anonymity misses), a small diverse " +
      "one is not") {
    val rows = Seq(
      // class (us,1): 5 rows, all sensitive 'x' -> k-anonymous, NOT
      // l-diverse at l=2
      ("us", 1, "x"), ("us", 1, "x"), ("us", 1, "x"),
      ("us", 1, "x"), ("us", 1, "x"),
      // class (fr,1): 2 rows, 2 distinct -> diverse
      ("fr", 1, "x"), ("fr", 1, "y")
    ).toDF("country", "band", "diag")
    val got = Privacy.lDiversityClasses(rows,
        Seq(col("country"), col("band")), col("diag"), l = 2)
      .select($"country", $"band", $"class_size", $"n_sensitive",
        $"at_risk")
      .as[(String, Int, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("us", 1, 5L, 1L, true), ("fr", 1, 2L, 2L, false)))
  }

  test("tClosenessClasses: closed-form EMD — a class mirroring the " +
      "table scores 0, a homogeneous class scores 1 - p(s), the flag " +
      "cross-multiplies exactly at the threshold, and a NULL " +
      "sensitive value is a category like any other") {
    // table: 8 rows, sensitive x:5, y:2, null:1 -> p = (5/8, 2/8, 1/8)
    // class A (6 rows: x3 y2 null1):
    //   emd = (|3/6-5/8| + |2/6-2/8| + |1/6-1/8|)/2 = 6/24/2 = 1/8
    // class B (2 rows, all x):
    //   emd = (|1-5/8| + 2/8 + 1/8)/2 = 3/8
    val rows = Seq(
      ("A", Some("x")), ("A", Some("x")), ("A", Some("x")),
      ("A", Some("y")), ("A", Some("y")), ("A", None),
      ("B", Some("x")), ("B", Some("x"))
    ).toDF("qi", "s")
    val got = Privacy.tClosenessClasses(rows, Seq(col("qi")), col("s"),
        tNum = 1, tDen = 4)
      .select($"qi", $"class_size", $"emd", $"at_risk")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") == ((6L, 0.125, false)))
    assert(got("B") == ((2L, 0.375, true)))
    // exact threshold boundary: t = 3/8 -> emd(B) == t is NOT a breach
    val atT = Privacy.tClosenessClasses(rows, Seq(col("qi")), col("s"),
        tNum = 3, tDen = 8)
      .select($"qi", $"at_risk").as[(String, Boolean)].collect().toMap
    assert(atT == Map("A" -> false, "B" -> false))
    // null QUASI-IDENTIFIER is its own class (null-safe scaffold join)
    val withNullQi = Seq((Some("A"), "x"), (Option.empty[String], "x"),
      (Option.empty[String], "y")).toDF("qi", "s")
    val nq = Privacy.tClosenessClasses(withNullQi, Seq(col("qi")),
        col("s"), tNum = 1, tDen = 10)
      .select($"qi", $"class_size", $"emd")
      .as[(Option[String], Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // table p = (2/3 x, 1/3 y); null class = (1/2, 1/2) ->
    // emd = (|1/2-2/3| + |1/2-1/3|)/2 = 1/6
    assert(nq(None)._1 == 2L)
    assert(math.abs(nq(None)._2 - 1.0 / 6.0) < 1e-15, nq.toString)
    assert(nq(Some("A")) == ((1L, 1.0 / 3.0)))
  }

  test("quantileProfile: order statistics match a sorted-Seq " +
      "reference, including size-1 and size-2 groups") {
    val rows = Seq.tabulate(37)(i => ("big", (i * 7 + 3) % 100, i)) ++
      Seq(("one", 42, 100), ("two", 5, 101), ("two", 9, 102))
    val df = rows.toDF("grp", "v", "id")
    val got = Privacy.quantileProfile(df, "grp", "v", "id")
      .select($"grp", $"n", $"p25", $"p50", $"p75", $"p90")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def ref(vs: Seq[Int], num: Int, den: Int): Long = {
      val sorted = vs.sorted
      sorted(((num.toLong * vs.size + den - 1) / den - 1).toInt).toLong
    }
    for ((g, vs) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
      val (_, n, p25, p50, p75, p90) = got(g)
      assert(n == vs.size)
      assert(p25 == ref(vs, 1, 4), s"$g p25")
      assert(p50 == ref(vs, 2, 4), s"$g p50")
      assert(p75 == ref(vs, 3, 4), s"$g p75")
      assert(p90 == ref(vs, 9, 10), s"$g p90")
    }
  }
}
