package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def ref(docs: Seq[(Long, Long)], seqLen: Long)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).map { case (id, n) =>
      val start = cum
      cum += n
      val lastSeq = if (n > 0) (cum - 1) / seqLen else start / seqLen
      id -> ((n, start, start / seqLen, lastSeq, start % seqLen))
    }.toMap
  }

  test("concatChunk matches a sequential reference: offsets, straddle " +
      "spans, zero-token docs, and exact seqLen-boundary starts") {
    // lengths tuned to hit: doc ending exactly at a boundary (10+6=16),
    // doc starting at a boundary, a doc spanning >2 sequences (40),
    // a zero-token doc between straddlers
    val docs = Seq((1L, 10L), (2L, 6L), (3L, 40L), (4L, 0L), (5L, 3L),
      (6L, 13L), (7L, 16L), (8L, 1L))
    val got = Packing.concatChunk(docs.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", seqLen = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == ref(docs, 16))
    assert(got(3L)._4 - got(3L)._3 == 2)   // doc 3 spans 3 sequences
    assert(got(3L)._2 == 16 && got(3L)._5 == 0) // starts ON a boundary
    assert(got(4L)._3 == got(4L)._4)       // zero-token doc: one seq
  }

  test("tokenBudgetSelect keeps docs starting inside the budget in " +
      "priority order, straddler whole, and respects the caller's " +
      "order columns") {
    val docs = Seq( // (id, n_tok, priority asc = selected first)
      (1L, 10L, 2L), (2L, 10L, 0L), (3L, 10L, 1L), (4L, 10L, 3L))
    val got = Packing.tokenBudgetSelect(
        docs.toDF("doc_id", "n_tok", "pri"),
        "doc_id", "n_tok", Seq("pri", "doc_id"), budget = 25L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // order: 2 (start 0), 3 (10), 1 (20: straddles 25, kept), 4 (30: out)
    assert(got == Map(2L -> 0L, 3L -> 10L, 1L -> 20L))
    // shuffled concatChunk follows the order columns, not the id order
    val packed = Packing.concatChunk(
        docs.toDF("doc_id", "n_tok", "pri"),
        "doc_id", "n_tok", seqLen = 16,
        orderCols = Seq("pri", "doc_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(packed == Map(2L -> 0L, 3L -> 10L, 1L -> 20L, 4L -> 30L))
  }

  test("packing is partitioning-independent (the prefix scan's range " +
      "partitioner, not input layout, defines the order)") {
    val docs = (0L until 500L).map(i => (i, (i * 37 % 90) + 10))
    val a = Packing.concatChunk(docs.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", seqLen = 256)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = Packing.concatChunk(
        docs.reverse.toDF("doc_id", "n_tok").repartition(13),
        "doc_id", "n_tok", seqLen = 256)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a == ref(docs, 256).map { case (id, t) =>
      (id, t._1, t._2, t._3, t._4, t._5) }.toSet)
  }
}
