package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition statistics over per-key event
  * sequences — the behavioral summary next to sessionization (q24)
  * and funnels (q153): which state follows which, how often, and with
  * what conditional probability. Product analytics reads it as the
  * user-flow graph; a curation pipeline reads it over document
  * processing states (fetched → parsed → filtered → kept) as the
  * pipeline-health matrix.
  *
  * Scale shape: one window over (key, order) to pair consecutive
  * events — partitioned by the stream key, the same per-stream sort
  * every event operator here uses — then hash-aggs whose output is
  * bounded by |states|², a catalog-sized frame; the row-count
  * normalizer joins on that aggregated frame, never on the log.
  * Probabilities are n/n_from on exact longs (identical double
  * division in both engines).
  */
object Markov {

  /** Transition counts + conditional probabilities:
    * (from_state, to_state, n, n_from, p) for consecutive events
    * within each key under `orderCols` (use a total order — ties make
    * "consecutive" ambiguous). */
  def transitions(events: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val trans = events
      .select((Seq(col(keyCol), col(stateCol).as("to_state")) ++
        orderCols.map(col)): _*)
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = trans.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    trans.join(fromTotals, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        col("n_from"),
        (col("n").cast("double") / col("n_from")).as("p"))
  }
}
