package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Typed cogroup — per-key merge of two datasets with arbitrary Scala
  * logic over both groups at once (the operator shape joins can't
  * express: interleaving, per-key sorting across sides, custom merge
  * state). Both sides shuffle once on the key; each key's groups meet on
  * one executor, so memory is bounded by the largest single key, not the
  * table. The canonical use here: stitch a customer's orders into an
  * ordered activity timeline.
  */
object CoGroup {

  /** Generic typed cogroup: full outer per-key merge. */
  def coGroup[K: Encoder, A, B, R: Encoder](left: Dataset[A],
      right: Dataset[B])(leftKey: A => K, rightKey: B => K)(
      merge: (K, Iterator[A], Iterator[B]) => IterableOnce[R])
      : Dataset[R] =
    left.groupByKey(leftKey).cogroup(right.groupByKey(rightKey))(merge)

  case class TimelineEntry(custkey: Long, seq: Int, kind: String,
      detail: String)

  /** Per-customer activity timeline: the customer record followed by
    * their orders in date order — an interleaved per-key merge that a
    * relational join would need window tricks to express. */
  def customerTimeline(
      customers: Dataset[(Long, String)], // (custkey, name)
      orders: Dataset[(Long, java.sql.Timestamp, Double)]) // (custkey, date, price)
      : Dataset[TimelineEntry] = {
    import customers.sparkSession.implicits._
    coGroup(customers, orders)(_._1, _._1) { (key, cs, os) =>
      val header = cs.toSeq.headOption.map(c =>
        TimelineEntry(key, 0, "customer", c._2)).toSeq
      val body = os.toSeq.sortBy(o => (o._2.getTime, o._3))
        .zipWithIndex.map { case (o, i) =>
          TimelineEntry(key, i + 1, "order", f"${o._3}%.2f")
        }
      header ++ body
    }
  }
}
