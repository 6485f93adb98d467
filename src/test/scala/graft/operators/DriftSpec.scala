package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)

  private def replay(a: Seq[String], b: Seq[String], k: Int) = {
    val ca = a.flatMap(_.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val cb = b.flatMap(_.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (ta, tb) = (ca.values.sum, cb.values.sum)
    val tt = (ta + tb).toDouble
    def cell(o: Long, ct: Long, colT: Long): Double =
      if (o == 0) 0.0
      else o.toDouble * math.log((o.toDouble * tt) /
        (ct.toDouble * colT.toDouble))
    val g2 = (ca.keySet ++ cb.keySet).toSeq.map { t =>
      val (x, y) = (ca.getOrElse(t, 0L), cb.getOrElse(t, 0L))
      val ab = x + y
      val rest = ta + tb - ab
      val g = (cell(x, ta, ab) + cell(y, tb, ab) +
        cell(ta - x, ta, rest) + cell(tb - y, tb, rest)) * 2.0
      (t, x, y, g)
    }
    (g2.sortBy { case (t, _, _, g) => (-g, t) }, ta, tb)
  }

  test("keynessTopK matches a driver replay of the Dunning G2 table " +
      "on the real corpus, and the rank surface sits on gaps far " +
      "above ulp noise at the cut") {
    val aT = docs.filter($"lang" === "en").select($"text")
      .as[String].collect().toSeq
    val bT = docs.filter($"lang" =!= "en").select($"text")
      .as[String].collect().toSeq
    val (exp, ta, tb) = replay(aT, bT, 30)
    val got = Drift.keynessTopK(docs.filter($"lang" === "en"),
        docs.filter($"lang" =!= "en"), "text", 30)
      .select($"rk", $"tok", $"ca", $"cb", $"direction")
      .as[(Long, String, Long, Long, String)].collect().sortBy(_._1)
    assert(got.length == 30)
    got.zip(exp.take(30)).foreach { case (g, (t, x, y, _)) =>
      assert(g._2 == t && g._3 == x && g._4 == y, s"rank ${g._1}: $g vs $t")
      val dir = if (x * tb > y * ta) "a" else "b"
      assert(g._5 == dir, s"direction of $t")
    }
    // the 30/31 cut: distinct contingency tables must be separated by
    // far more than the ~1e-16 relative ulp noise ln() can carry
    val cut = exp(29)._4
    val next = exp(30)._4
    if ((exp(29)._2, exp(29)._3) != (exp(30)._2, exp(30)._3)) {
      val gap = math.abs(cut - next) / math.max(math.abs(cut), 1e-300)
      assert(gap > 1e-9, s"G2 gap at the cut is $gap — too tight")
    }
  }

  test("planted drift: a token exclusive to corpus A ranks first with " +
      "direction a; symmetric tokens tie-break deterministically") {
    val a = Seq((1L, "xx yy common common"), (2L, "xx common zz"))
      .toDF("id", "text")
    val b = Seq((3L, "common common yy zz"), (4L, "common zz yy"))
      .toDF("id", "text")
    val got = Drift.keynessTopK(a, b, "text", 5)
      .select($"rk", $"tok", $"direction")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.head._2 == "xx" && got.head._3 == "a", got.mkString(","))
    // all four distinct tokens present (k=5 exceeds the vocabulary),
    // ranks 1..4, no duplicates
    assert(got.map(_._1).toSeq == (1L to 4L) &&
      got.map(_._2).distinct.length == 4)
  }

  test("vocabGrowth == driver replay on the real corpus; curves " +
      "monotone; tail checkpoint covers the whole corpus; ladder " +
      "guards; partitioning independence") {
    val cps = (1L to 10L).map(_ * 50L)
    val got = Drift.vocabGrowth(docs, "doc_id", "text", cps)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val expect = cps.map { n =>
      val pre = rows.take(n.toInt)
      (n, pre.length.toLong,
        pre.map(_._2.split(" ", -1).length.toLong).sum,
        pre.flatMap(_._2.split(" ", -1)).distinct.length.toLong)
    }
    assert(got.toSeq == expect,
      s"first diff: ${got.zip(expect).find(p => p._1 != p._2)}")
    // monotone non-decreasing in every cumulative column
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4) }
    // a checkpoint beyond the corpus reports the whole corpus
    val beyond = Drift.vocabGrowth(docs, "doc_id", "text",
        Seq(1000000L)).as[(Long, Long, Long, Long)].head()
    assert(beyond._2 == rows.length.toLong &&
      beyond._4 == rows.flatMap(_._2.split(" ", -1))
        .distinct.length.toLong)
    // partitioning independence: ranks come from the id order, not
    // the physical layout
    val shuffled = Drift.vocabGrowth(docs.repartition(7), "doc_id",
        "text", cps).as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(shuffled.toSeq == expect)
    intercept[IllegalArgumentException] {
      Drift.vocabGrowth(docs, "doc_id", "text", Seq(100L, 50L))
    }
    intercept[IllegalArgumentException] {
      Drift.vocabGrowth(docs, "doc_id", "text", Seq(50L, 50L))
    }
    intercept[IllegalArgumentException] {
      Drift.vocabGrowth(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Drift.vocabGrowth(docs, "doc_id", "text", (1L to 1001L))
    }
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing coverage, " +
      "including the f2 = 0 bias-corrected fallback") {
    // g: tokens a a b c -> N=4 D=3 f1=2 f2=1: chao1 = 3 + 4/2 = 5,
    //    coverage = 1 - 2/4 = 0.5
    // h: tokens a a a b -> f1=1 f2=0: fallback chao1 = 2 + 0/2 = 2
    val docs = Seq(("g", "a a"), ("g", "b c"), ("h", "a a a b"))
      .toDF("part", "text")
    val got = Drift.vocabRichness(docs, "part", "text")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 4L, 3L, 2L, 1L, 5.0, 0.5)))
    assert(got("h") == (("h", 4L, 2L, 1L, 0L, 2.0, 0.75)))
  }
}
