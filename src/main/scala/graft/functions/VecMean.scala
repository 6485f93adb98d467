package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF"): elementwise mean of
  * embedding vectors — the centroid aggregate an IVF-style index build
  * needs. Partial aggregation is the (sum-vector, count) buffer, so the
  * shuffle carries one buffer per group per task (map-side combine),
  * exactly like a builtin agg.
  */
object VecMean extends Aggregator[Array[Float], (Array[Double], Long),
    Array[Double]] {
  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float])
      : (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long))
      : (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      val acc = x._1.clone()
      var i = 0
      while (i < acc.length) { acc(i) += y._1(i); i += 1 }
      (acc, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.empty else b._1.map(_ / b._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
