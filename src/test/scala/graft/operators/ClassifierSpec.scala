package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(gram: String, b: Int): Int =
    Integer.parseInt(md5hex(gram).take(4), 16) % b

  private val B = 64
  private val C = 3
  private def w(b: Long, c: Long): Long = (b * 2654435761L + c * 40503L) % 1997L - 998L

  private lazy val weights = spark.range(0, B)
    .select($"id".cast("int").as("bucket"),
      array((0 until C).map(c => ($"id" * 2654435761L + lit(c.toLong * 40503L))
        % 1997L - 998L): _*).as("w"))

  test("scores match a from-first-principles recompute (bag semantics: " +
      "repeated instances count repeatedly)") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the"), // repeated unigrams AND repeated bigrams
      (3L, "solo")).toDF("doc_id", "text")
    val got = Classifier.scoreHashedLinear(docs, "doc_id", "text",
      weights, C, B).collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq((1L, "the cat sat on the mat"),
        (2L, "the the the"), (3L, "solo"))) {
      val toks = text.split(" ", -1).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val exp = (0 until C).map(c =>
        feats.map(g => w(bucket(g, B).toLong, c.toLong)).sum)
      val r = got(id)
      assert(r.getLong(1) == feats.size, s"n_feats doc $id")
      for (c <- 0 until C)
        assert(r.getLong(2 + c) == exp(c), s"s$c doc $id")
      val best = exp.max
      assert(r.getLong(2 + C) == exp.indexWhere(_ == best).toLong,
        s"label doc $id")
    }
  }

  test("ties break to the lowest class id; null text zeroes out with " +
      "label 0") {
    // uniform weight table: every class scores identically → label 0
    val flat = spark.range(0, B).select($"id".cast("int").as("bucket"),
      array((0 until C).map(_ => lit(7L)): _*).as("w"))
    val docs = Seq((1L, Some("a b c")), (2L, None))
      .toDF("doc_id", "text")
    val rows = Classifier.scoreHashedLinear(docs, "doc_id", "text",
      flat, C, B).orderBy("doc_id").collect()
    val r1 = rows(0)
    assert(r1.getLong(2) == r1.getLong(3) && r1.getLong(3) == r1.getLong(4))
    assert(r1.getLong(2 + C) == 0L) // tie → class 0
    val r2 = rows(1) // null text: no features, zero scores, label 0
    assert(r2.getLong(1) == 0L && (2 to 4).forall(i => r2.getLong(i) == 0L))
    assert(r2.getLong(2 + C) == 0L)
  }

  test("plan: weight join broadcasts; one shuffle keyed by doc_id") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Classifier.scoreHashedLinear(docs, "doc_id", "text",
      weights, C, B).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("aucRoc: hand-computed U with midrank ties, perfect = 1, " +
      "reversed = 0, one-class group is NULL (undefined)") {
    // t: pos {3,3,2}, neg {1,3} -> pairs won 3 (vs neg 1) + ties 2*0.5
    //    = U 4 -> u2 8, auc 8/(2*3*2) = 2/3
    // perf: pos {5,6} > neg {1,2} -> U 4, auc 1; rev: pos {1} < both
    // onec: positives only -> auc NULL
    val rows = Seq(
      ("t", 3L, true), ("t", 3L, true), ("t", 2L, true),
      ("t", 1L, false), ("t", 3L, false),
      ("perf", 5L, true), ("perf", 6L, true),
      ("perf", 1L, false), ("perf", 2L, false),
      ("rev", 1L, true), ("rev", 2L, false), ("rev", 3L, false),
      ("onec", 7L, true), ("onec", 8L, true))
      .toDF("g", "s", "gold")
    val got = Classifier.aucRoc(rows, "g", "s", "gold")
      .as[(String, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("t") == (("t", 3L, 2L, 8L, Some(2.0 / 3.0))))
    assert(got("perf") == (("perf", 2L, 2L, 8L, Some(1.0))))
    assert(got("rev") == (("rev", 1L, 2L, 0L, Some(0.0))))
    assert(got("onec") == (("onec", 2L, 0L, 0L, None)))
  }
}
