package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Okapi BM25 keyword relevance over a document corpus — the classic
  * quality-/topicality-scoring primitive of training-data curation
  * (keep documents that score high against a seed-term profile, the
  * "educational value" style filter).
  *
  * Scale shape: TWO corpus passes — a stats pass reduces per-document
  * term frequencies (codegen'd array filters — no explode, no per-term
  * shuffle) into one (N, avgdl, df_t) row, which broadcasts back over
  * a second scoring scan whose score is a per-row expression. Nothing
  * but the one-row stats frame ever leaves the scan's partitioning;
  * top-k goes through TakeOrderedAndProject. (The two scans are the
  * standard global-normalization shape; cache the tf projection first
  * if the corpus scan dominates.)
  */
object Bm25 {

  /** Top-`k` documents by BM25 score with a 1-based `rk`: the global
    * sort is a TakeOrderedAndProject (per-partition heaps, never a full
    * exchange), and rank assignment runs over just the k survivors.
    * `rk` — not the raw score — is the cross-engine-comparable surface:
    * ln() differs in the last ulp between libm implementations, rank
    * ordering does not (score ties are id-tiebroken identically
    * everywhere). */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    scores(docs, textCol, idCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol)).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rk"))

  /** Score every document against `terms`; returns (idCol, score). */
  def scores(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one scoring term")
    val toks = TextFunctions.tokens(col(textCol))
    def tfCol(i: Int) = s"__tf$i"
    val base = terms.zipWithIndex.foldLeft(
      docs.select(col(idCol),
        size(toks).cast("double").as("__dl"),
        toks.as("__toks"))) { case (df, (t, i)) =>
      df.withColumn(tfCol(i),
        size(filter(col("__toks"), x => x === t)).cast("double"))
    }.drop("__toks")
    val statAggs = Seq(
      (sum(col("__dl")) / count(lit(1))).as("__avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(tfCol(i)) > 0, 1.0).otherwise(0.0)).as(s"__df$i"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n"), statAggs: _*)
    val scored = base.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(tfCol(i)); val df = col(s"__df$i")
      val idf = log((col("__n") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    scored.withColumn("score", score).select(col(idCol), col("score"))
  }
}
