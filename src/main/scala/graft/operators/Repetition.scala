package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher/MassiveText-style WITHIN-document repetition signals (Rae et
  * al. 2021, "Scaling Language Models", table A1), the standard
  * template-junk filters of a training-data curation pass — documents
  * dominated by one repeated phrase or by internally duplicated windows
  * get dropped before any cross-document dedup even runs. Token-level
  * re-expression of the paper's character fractions (the fixture corpus
  * is whitespace-tokenized):
  *
  *  - `topN_frac`: (occurrences of the doc's most frequent n-gram) × n
  *    / n_tokens — the "fraction of tokens in the most common n-gram".
  *    Overlapping occurrences are counted as the paper (and the public
  *    implementations) do, so a degenerate "a a a …" doc can exceed
  *    1.0; the signal is a filter threshold, not a probability.
  *  - `dupN_cov`: fraction of tokens covered by the UNION of all
  *    n-gram windows occurring ≥2 times within the document —
  *    overlap-correct via the same gaps-and-islands pass as
  *    [[Dedup.repeatedSpans]], only partitioned per document with no
  *    cross-document join at all.
  *
  * Scale shape (100 TB): every signal is explode → hash-aggregate keyed
  * by (doc_id, gram) then doc_id — partial aggregation combines
  * map-side, nothing shuffles wider than one row per distinct in-doc
  * gram, and there is no join between documents anywhere. The three
  * signals share the doc_id partitioning, so the final assembly joins
  * collapse into one exchange.
  */
object Repetition {

  /** Most-frequent-n-gram token fraction per document:
    * (doc_id, topN_count, topN_frac). */
  private def topNgram(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("__nt"),
      explode(positionalShingles(col(textCol), n)).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("__c"), first(col("__nt")).as("__nt"))
      .groupBy(col("doc_id"))
      .agg(max(col("__c")).as(s"top${n}_count"),
        ((max(col("__c")) * n).cast("double") /
          first(col("__nt")).cast("double")).as(s"top${n}_frac"))
  }

  /** Union-coverage fraction of duplicated n-gram windows per document:
    * (doc_id, dupN_cov). Documents with no within-doc duplicate n-gram
    * are absent (coverage 0 — the caller coalesces). */
  private def dupCoverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("__nt"),
      posexplode(positionalShingles(col(textCol), n)).as(Seq("pos", "gram")))
    // within-doc duplicate windows: count over (doc, gram) — a window,
    // not a self-join; the corpus never meets itself
    val flagged = grams.withColumn("__c",
        count(lit(1)).over(Window.partitionBy(col("doc_id"), col("gram"))))
      .filter(col("__c") >= 2)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    flagged
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(w).isNull
          .or(col("pos") > lag(col("pos"), 1).over(w) + (n - 1)), 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg((max(col("pos")) + (n - 1) - min(col("pos")) + 1).as("__cov"),
        first(col("__nt")).as("__nt"))
      .groupBy(col("doc_id"))
      .agg((sum(col("__cov")).cast("double") /
        first(col("__nt")).cast("double")).as(s"dup${n}_cov"))
  }

  /** Gopher table A1's duplicate-LINE signals at a caller-chosen
    * grain (lines for sep="\n", paragraphs for a paragraph separator):
    * per document, the fraction of lines that belong to a within-doc
    * duplicate group ("duplicate line fraction" — every member of a
    * group counts, matching the published filters) and the fraction
    * of characters those lines carry ("duplicate line character
    * fraction"; denominators count line content only, separators
    * excluded). Output: (doc_id, n_lines, dup_frac, dup_char_frac),
    * one row per input document — a doc with no duplicate line scores
    * 0, and an all-empty doc scores 0 char-fraction rather than NaN
    * (total semantics, like [[profile]]).
    *
    * Scale shape: explode → (doc, line)-keyed hash-agg → doc-keyed
    * hash-agg, both with map-side partial combine; no window, no join,
    * no cross-document anything — the boilerplate mega-line ("footer"
    * in 10⁹ docs) is NOT a hot key because the first aggregate is
    * keyed by (doc, line), not line. */
  def dupLineProfile(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as("__line"))
      .groupBy(col("doc_id"), col("__line"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__chars", col("__c") * length(col("__line")))
      .withColumn("__dup", col("__c") >= 2)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("__c")).as("n_lines"),
        (sum(when(col("__dup"), col("__c")).otherwise(0L))
            .cast("double") /
          sum(col("__c")).cast("double")).as("dup_frac"),
        when(sum(col("__chars")) === 0, lit(0.0))
          .otherwise(
            sum(when(col("__dup"), col("__chars")).otherwise(0L))
              .cast("double") /
            sum(col("__chars")).cast("double")).as("dup_char_frac"))

  /** The per-document repetition profile the Gopher filters threshold:
    * (doc_id, n_tokens, top2_count, top2_frac, top3_count, top3_frac,
    * dup5_cov). One row per input document — a document too short to
    * have an n-gram at all scores 0 for that signal (nothing repeats),
    * it is never dropped and never null: a curation filter must see
    * every document exactly once. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    base
      .join(topNgram(docs, idCol, textCol, 2), Seq("doc_id"), "left")
      .join(topNgram(docs, idCol, textCol, 3), Seq("doc_id"), "left")
      .join(dupCoverage(docs, idCol, textCol, 5), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top2_count"), lit(0L)).cast("long")
          .as("top2_count"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_count"), lit(0L)).cast("long")
          .as("top3_count"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        coalesce(col("dup5_cov"), lit(0.0)).as("dup5_cov"))
  }

  /** CROSS-document novelty profile — the corpus-redundancy diagnostic
    * that tells a pipeline owner how much of each document is new
    * material versus shingles the corpus has already seen: per doc,
    * the fraction of its distinct n-gram shingles whose FIRST corpus
    * occurrence (minimum doc id over an append-ordered id) is this
    * document. A crawl full of templates shows novelty collapsing
    * toward 0 as ids grow; a healthy diverse corpus plateaus. The
    * within-doc signals above can't see this (they never cross
    * documents); the dedup joins only see pairs above a threshold —
    * novelty is the corpus-wide prefix view.
    *
    * Scale shape: explode distinct shingles → ONE gram-keyed hash agg
    * (min doc id, map-side combine) → join back on the gram → doc-
    * keyed count agg. The gram-keyed exchange carries one row per
    * distinct (doc, gram); no self-join, no window, no pair
    * materialization. Output: (doc_id, n_shingles, n_novel, novelty);
    * docs with no shingle (< n tokens) are absent. */
  def noveltyProfile(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val ex = docs.select(col(idCol).as("doc_id"),
        distinctShingles(col(textCol), n).as("__sh"))
      .select(col("doc_id"), explode(col("__sh")).as("s"))
      .repartition(col("s")) // one exchange shared by agg + join probe
    val firstSeen = ex.groupBy(col("s"))
      .agg(min(col("doc_id")).as("__first"))
    ex.join(firstSeen, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles"))
  }
}
