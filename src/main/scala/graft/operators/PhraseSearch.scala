package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase search through a POSITIONAL inverted index — the
  * "find every document containing any of these exact phrases" shape
  * (banned-phrase screens, quote tracing, benchmark-contamination
  * probes over literal prompts). A `contains()` scan answers one
  * phrase per pass over the corpus; the positional join answers the
  * whole phrase table in one pass.
  *
  * Plan: the corpus is tokenized ONCE into (doc, position, term)
  * postings; the phrase table explodes into (phrase, offset, term)
  * rows and BROADCASTS (a phrase list is KBs — it never shuffles the
  * corpus); the postings⋈terms join aligns candidate starts
  * (start = position − offset), and a phrase matches at a start iff
  * ALL its offsets found a posting there — a count over the
  * (doc, phrase, start) group, because a given (start, offset) cell
  * is satisfied by at most the single token at that position. Cost is
  * one corpus scan + a hash agg over surviving postings; phrase terms
  * prune the scan through the broadcast join, so selective phrases
  * read almost nothing.
  */
object PhraseSearch {

  /** Per-document hit counts for every phrase in `phrases`
    * (`phraseIdCol`, `termsCol: array<string>`). Output:
    * (phrase_id, phrase, doc_id, n_hits) — one row per (phrase, doc)
    * with at least one exact-position match; n_hits counts distinct
    * match starts (overlapping matches each count). */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, phraseIdCol: String, termsCol: String)
      : DataFrame = {
    // the per-start agg keys NARROW ids only (r18, guide "shuffle fewer
    // bytes": the phrase string and plen are functionally dependent on
    // phrase_id — carrying them through the posting-sized shuffle paid
    // string hashing + bytes per surviving posting for columns a
    // phrase-table broadcast re-attaches at match-count grain)
    val meta = phrases.select(col(phraseIdCol).as("phrase_id"),
      array_join(col(termsCol), " ").as("phrase"),
      size(col(termsCol)).as("plen"))
    val ph = phrases.select(col(phraseIdCol).as("phrase_id"),
      posexplode(col(termsCol)).as(Seq("off", "term")))
    val postings = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    postings.join(broadcast(ph), Seq("term"))
      .withColumn("start", col("pos") - col("off"))
      .filter(col("start") >= 0)
      .groupBy(col("doc_id"), col("phrase_id"), col("start"))
      .agg(count(lit(1)).as("n_off"))
      .join(broadcast(meta), Seq("phrase_id"))
      .filter(col("n_off") === col("plen"))
      .groupBy(col("phrase_id"), col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
