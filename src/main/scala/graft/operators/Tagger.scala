package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The dictionary entry text for a tag id, as a literal when-chain
    * (model-sized — the dictionary is a reference object, never a
    * joined table). */
  private def phraseOf(dict: Seq[String], tag: Column): Column =
    dict.zipWithIndex.map { case (p, i) => when(tag === i, lit(p)) }
      .reduceRight((w, o) => w.otherwise(o))

  /** (idCol, tag_id, phrase) — one row per (document, matched
    * phrase); substring semantics (`contains`). */
  def tagDocs(docs: DataFrame, idCol: String, textCol: String,
      dict: Seq[String]): DataFrame = {
    val tagged = docs.select(col(idCol),
      explode(TextFunctions.dictTags(col(textCol), dict)).as("tag_id"))
    tagged.select(col(idCol), col("tag_id").cast("long").as("tag_id"),
      phraseOf(dict, col("tag_id")).as("phrase"))
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
    spans.select(col(idCol),
        col("sp.tag").cast("long").as("tag_id"),
        col("sp.pos").cast("long").as("pos"))
      .withColumn("phrase", phraseOf(dict, col("tag_id")))
  }

  /** Proximity co-occurrence: every pair of span occurrences of TWO
    * DIFFERENT dictionary entries whose 1-based start offsets lie
    * within `maxDist` characters of each other, in the same document
    * — the relation-candidate / "entity near entity" surface
    * (drug+dosage, name+id-number, brand+complaint term) built on the
    * same one-pass automaton as [[tagSpans]].
    *
    * Contract: `tag_a < tag_b` strictly (a pair of the SAME entry is
    * never a candidate — that is repetition, [[Repetition]]'s job),
    * distance is `abs(pos_a - pos_b)` over start offsets (documented
    * choice: phrase length does not shift the window), and nested
    * entries matching at the same offset ("agg" inside "agg row")
    * co-occur at distance 0 — the span list is the authority.
    *
    * Scale shape: the pairing happens INSIDE the row with array
    * higher-order functions over the span list — per-document cost
    * O(hits²) with hits bounded by the dictionary's sparsity, ZERO
    * joins and ZERO exchanges at any corpus size (contrast a
    * spans-table self-join, which would shuffle every hit on doc id).
    * One scan, one explode of the surviving pairs. */
  def spanPairs(docs: DataFrame, idCol: String, textCol: String,
      dict: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val sp = TextFunctions.dictTagSpans(col(textCol), dict)
    val pairs = filter(
      flatten(transform(sp, a => transform(sp, b =>
        struct(a("tag").as("tag_a"), a("pos").as("pos_a"),
          b("tag").as("tag_b"), b("pos").as("pos_b"))))),
      p => p("tag_a") < p("tag_b") &&
        abs(p("pos_a") - p("pos_b")) <= maxDist)
    docs.select(col(idCol), explode(pairs).as("p"))
      .select(col(idCol),
        col("p.tag_a").cast("long").as("tag_a"),
        col("p.pos_a").cast("long").as("pos_a"),
        phraseOf(dict, col("p.tag_a")).as("phrase_a"),
        col("p.tag_b").cast("long").as("tag_b"),
        col("p.pos_b").cast("long").as("pos_b"),
        phraseOf(dict, col("p.tag_b")).as("phrase_b"))
  }
}
