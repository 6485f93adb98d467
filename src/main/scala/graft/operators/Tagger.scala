package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Dictionary/taxonomy tagging — label every document with the
  * dictionary phrases it contains (product names, topic keywords,
  * blocklist terms): the curation pass that routes documents to
  * downstream mixes ("tag then weight by tag") or audits coverage.
  *
  * Scale shape: ONE corpus pass; the whole dictionary rides inside
  * the native [[graft.expressions.DictTags]] Aho–Corasick expression
  * (goto/fail automaton built once per executor from the expression's
  * reference object), so per-row cost is O(bytes of text) REGARDLESS
  * of dictionary size — a 10k-phrase taxonomy costs the same scan as
  * a 10-phrase one. Contrast [[PhraseSearch.phraseHits]], which
  * builds positional postings and pays per phrase-hit; that is the
  * right tool for positional queries, this is the right tool for big
  * fixed dictionaries. Zero shuffles up to the output explode; the
  * per-tag aggregate shuffles one (tag, doc) row per HIT, not per
  * document. */
object Tagger {

  /** (idCol, tag_id, phrase) — one row per (document, matched
    * phrase); substring semantics (`contains`). */
  def tagDocs(docs: DataFrame, idCol: String, textCol: String,
      dict: Seq[String]): DataFrame = {
    val tagged = docs.select(col(idCol),
      explode(TextFunctions.dictTags(col(textCol), dict)).as("tag_id"))
    val phrases = dict.zipWithIndex.map { case (p, i) =>
      when(col("tag_id") === i, lit(p)) }
    val phrase = phrases.reduceRight((w, o) => w.otherwise(o))
    tagged.select(col(idCol), col("tag_id").cast("long").as("tag_id"),
      phrase.as("phrase"))
  }

  /** Per-tag coverage report: (tag_id, phrase, n_docs) — the
    * dictionary-audit aggregate (which taxonomy entries actually
    * occur, and how often). */
  def tagCoverage(docs: DataFrame, idCol: String, textCol: String,
      dict: Seq[String]): DataFrame =
    tagDocs(docs, idCol, textCol, dict)
      .groupBy(col("tag_id"), col("phrase"))
      .agg(count(lit(1)).as("n_docs"))

  /** (idCol, tag_id, pos, phrase) — EVERY occurrence with its 1-based
    * start offset (overlaps and repeats included): the
    * annotation/redaction span list, same one-pass automaton as
    * [[tagDocs]]. The output explode carries one row per HIT — at
    * 100 TB, bound hit volume by the dictionary (blocklists and
    * taxonomies are hit-sparse by nature) or aggregate before
    * exchanging. */
  def tagSpans(docs: DataFrame, idCol: String, textCol: String,
      dict: Seq[String]): DataFrame = {
    val spans = docs.select(col(idCol),
      explode(TextFunctions.dictTagSpans(col(textCol), dict)).as("sp"))
    val phrases = dict.zipWithIndex.map { case (p, i) =>
      when(col("tag_id") === i, lit(p)) }
    val phrase = phrases.reduceRight((w, o) => w.otherwise(o))
    spans.select(col(idCol),
        col("sp.tag").cast("long").as("tag_id"),
        col("sp.pos").cast("long").as("pos"))
      .withColumn("phrase", phrase)
  }
}
