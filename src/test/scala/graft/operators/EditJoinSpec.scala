package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance join: the q-gram prefix + length filters must be
  * EXACT (complete candidate generation) — the q159 gate oracles
  * against brute-force all-pairs, so any dropped candidate is a
  * correctness bug, not a recall tradeoff. The fixtures here cover
  * what the structured customer-name gate cannot: insertions,
  * deletions, repeated-gram strings, and the short-string pool.
  */
class EditJoinSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(df: DataFrame, k: Int, q: Int): Set[(Long, Long, Long)] =
    EditJoin.editDistancePairs(df, "s", "id", k = k, q = q)
      .select($"id_a", $"id_b", $"dist")
      .as[(Long, Long, Long)].collect().toSet

  private def brute(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = df.select($"id".as("id_a"), $"s".as("sa"))
    val b = df.select($"id".as("id_b"), $"s".as("sb"))
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("dist", levenshtein($"sa", $"sb").cast("long"))
      .filter($"dist" <= k)
      .select($"id_a", $"id_b", $"dist")
      .as[(Long, Long, Long)].collect().toSet
  }

  // substitutions, insertions, deletions, far-away strings, repeats
  private lazy val corpus: DataFrame = Seq(
    (1L, "alexander hamilton"),
    (2L, "alexandre hamilton"),   // 1 sub
    (3L, "alexander hamiltonn"),  // 1 ins
    (4L, "alexander hamilto"),    // 1 del
    (5L, "aleksander hamilton"),  // 2 edits from 1
    (6L, "completely different"),
    (7L, "aaaaaaaaaa"),           // repeated grams: occ-indexed elements
    (8L, "aaaaaaaaab"),
    (9L, "aaaaabaaaa"),
    (10L, "bbaaaaaaaa")
  ).toDF("id", "s")

  test("editDistancePairs == brute force at k=1 and k=2 " +
      "(insertions, deletions, repeated grams)") {
    for (k <- Seq(1, 2); q <- Seq(2, 3)) {
      val got = pairs(corpus, k, q)
      val exp = brute(corpus, k)
      assert(got == exp, s"k=$k q=$q: got ${got.size} expected " +
        s"${exp.size}; diff=${(got diff exp) ++ (exp diff got)}")
      assert(exp.nonEmpty, s"k=$k: fixture produced no pairs, vacuous")
    }
  }

  test("short pool: strings below the gram-guarantee length still " +
      "pair exactly (including len < q)") {
    val short = Seq(
      (1L, "ab"), (2L, "ac"), (3L, "b"), (4L, "a"), (5L, "abc"),
      (6L, "zzzz"), (7L, "zzz"), (8L, ""), (9L, "x"), (10L, "ax")
    ).toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = pairs(short, k, 3)
      val exp = brute(short, k)
      assert(got == exp, s"k=$k: got ${got.size} expected ${exp.size}; " +
        s"diff=${(got diff exp) ++ (exp diff got)}")
    }
  }

  test("mixed short/long corpus: the pool boundary loses no pairs") {
    // strings straddling len = q + k*q = 6 at q=2,k=2
    val mixed = Seq(
      (1L, "abcde"), (2L, "abcdef"), (3L, "abcdefg"), (4L, "abde"),
      (5L, "abcdz"), (6L, "bcdef"), (7L, "abcdefgh"), (8L, "abcd")
    ).toDF("id", "s")
    val got = pairs(mixed, 2, 2)
    val exp = brute(mixed, 2)
    assert(got == exp,
      s"diff=${(got diff exp) ++ (exp diff got)}")
    assert(exp.nonEmpty)
  }

  test("customer-name gate shape: prefix filter finds exactly the " +
      "brute-force pairs on shared-prefix keys") {
    val names = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey".as("id"), $"c_name".as("s"))
      .filter($"id" < 120)
    val got = pairs(names, 1, 2)
    val exp = brute(names, 1)
    assert(got == exp)
    assert(exp.nonEmpty, "no distance-1 name pairs — fixture changed")
  }

  test("qgramOccs == posexplode + row_number window (r19 kernel), " +
      "repeated-gram and unicode strings included") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.qgramOccs
    val rnd = new scala.util.Random(23)
    val strs = (1 to 120).map { i =>
      val len = rnd.nextInt(24)
      new String((0 until len).map(_ => "abcdeé漢"(rnd.nextInt(7))).toArray)
    } ++ Seq("aaaaaa", "ababab", "", "a", "漢漢漢漢")
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "s").withColumn("len", length($"s"))
    for (q <- Seq(1, 2, 3)) {
      val nw = df.filter($"len" >= q)
        .select($"id", explode(qgramOccs($"s", q)).as("go"))
        .select($"id", $"go.g".as("g"), $"go.occ".as("occ"))
      val od = df.filter($"len" >= q)
        .select($"id", posexplode(expr(
          s"transform(sequence(1, len - $q + 1), i -> substring(s, i, $q))"))
          .as(Seq("pos", "g")))
        .withColumn("occ", row_number().over(
          Window.partitionBy($"id", $"g").orderBy($"pos")).cast("int"))
        .select($"id", $"g", $"occ")
      assert(nw.exceptAll(od).count() == 0 && od.exceptAll(nw).count() == 0,
        s"q=$q diverged from the window form")
    }
  }
}
