package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end document-quality FUNNEL — the Gopher rule family
  * (Rae et al. 2021, arXiv:2112.11446 table A1) evaluated as one pass
  * that emits, for EVERY document, a keep/drop verdict plus the full
  * set of fired rules. Pipelines run exactly this shape before any
  * cross-document work: per-doc signals → thresholds → verdict, and
  * they need the reasons (not just the bit) for curation telemetry and
  * threshold tuning.
  *
  * Every rule is INTEGER-exact — token counts, summed token lengths,
  * lexicon hits, top-2-gram occurrence counts, compared by
  * cross-multiplication (chars·10 vs threshold·tokens; top2·2·100 vs
  * pct·tokens) — so the verdict is a pure function of the text with no
  * float anywhere, and a SQL oracle replays the whole funnel
  * bit-exactly. Reasons concatenate in a fixed rule order, so the
  * reason string is deterministic too.
  */
object Curation {

  /** Rule names in emission order. */
  val RuleOrder: Seq[String] =
    Seq("too_short", "too_long", "word_len", "stopwords", "repetition")

  /** Evaluate the funnel. Output: (doc_id, n_tokens, reasons — comma-
    * joined fired rules in [[RuleOrder]], "" when clean — and kept).
    * Thresholds: token-count bounds, mean-word-length bounds expressed
    * ×10 (minAvgWordLenX10 = 30 means 3.0 chars/word), a minimum
    * stopword hit count (the "is it prose" test), and the maximum
    * fraction of tokens the most common 2-gram may occupy, in percent
    * (Gopher drops at 20%; occurrences count overlapping windows ×2
    * tokens each, like [[Repetition.profile]]).
    *
    * Scale shape: one projection computes tokens/chars/stopwords in
    * the scan stage; the top-2-gram signal is the only shuffle —
    * (doc, gram)-keyed then doc-keyed hash aggs with map-side combine,
    * joined back doc-keyed. No cross-document key anywhere: the
    * boilerplate 2-gram repeated in 10⁹ docs partitions by (doc,
    * gram), never by gram alone. Short docs (< 2 tokens) have no
    * 2-gram and coalesce to a zero count — the funnel is total. */
  def gopherFunnel(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minAvgWordLenX10: Long = 30, maxAvgWordLenX10: Long = 100,
      minStopwords: Long = 2, maxTop2Pct: Long = 20,
      stopwords: Seq[String] = langLexicons("en")): DataFrame = {
    val t = col(textCol)
    val base = docs.select(col(idCol).as("doc_id"),
      nTokens(t).as("__n"),
      aggregate(transform(tokens(t), w => length(w).cast("long")),
        lit(0L), (a, x) => a + x).as("__chars"),
      lexiconHits(t, stopwords).as("__stop"))
    val top2 = docs
      .select(col(idCol).as("doc_id"),
        explode(positionalShingles(t, 2)).as("__g"))
      .groupBy(col("doc_id"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(max(col("__c")).as("__top2"))
    val n = col("__n")
    val reasons = concat_ws(",",
      when(n < minTokens, lit("too_short")),
      when(n > maxTokens, lit("too_long")),
      when(col("__chars") * 10 < n * minAvgWordLenX10 ||
        col("__chars") * 10 > n * maxAvgWordLenX10, lit("word_len")),
      when(col("__stop") < minStopwords, lit("stopwords")),
      when(coalesce(col("__top2"), lit(0L)) * 2 * 100 >=
        n * maxTop2Pct, lit("repetition")))
    base.join(top2, Seq("doc_id"), "left")
      .select(col("doc_id"), n.as("n_tokens"), reasons.as("reasons"))
      .withColumn("kept", col("reasons") === "")
  }
}
