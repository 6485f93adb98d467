package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding primitives (Sennrich et al., arXiv 1508.07909):
  * the pair-frequency statistics that drive vocabulary induction, and
  * the fixed-merge-table APPLY step that tokenizes a corpus with an
  * already-trained vocabulary. Training's greedy re-count loop is a
  * driver-side iteration over [[pairStats]]; apply — the operation a
  * pipeline runs per corpus pass, billions of times more often than it
  * trains — is a pure per-row projection here, zero shuffles.
  *
  * Merge semantics are the standard ones: merges apply in RANK ORDER,
  * one full left-to-right pass each; within a pass occurrences merge
  * greedily without overlap ("aaa" + (a,a) → "aa a", never "a aa").
  * That falls out of a sequential fold whose state is the emitted
  * token string: a just-merged pair becomes a LONGER symbol at the
  * tail, so it cannot re-match the pair's left side — no lookahead or
  * island bookkeeping needed, and the identical fold runs in both
  * engines (Spark `aggregate`, DuckDB `list_reduce`).
  *
  * Scale design: both operators are a single pass over the corpus.
  * [[pairStats]] is explode → one hash agg (map-side partials carry
  * at most |alphabet|² rows per task) → TakeOrdered heap.
  * [[applyMerges]] is a stateless projection — the merge table rides
  * inside the expression tree (a trained table is KBs), nothing
  * shuffles, nothing broadcasts.
  */
object Bpe {

  /** Adjacent within-word symbol-pair frequencies, descending —
    * one BPE training round's candidate table. Output:
    * (x, y, n) top-`k` by (n DESC, x, y) — the tie order makes the
    * cut deterministic. */
  def pairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = explode(split(col(textCol), " ")).as("word")
    val chars = transform(
      sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    // aggregate to the (word, count) table FIRST — the trainMerges
    // vocabulary shape (r18): the char-pair explode is an interpreted
    // higher-order chain, and running it once per DISTINCT word with
    // count-weighted sums instead of once per word instance cuts its
    // evaluations by the corpus's word-repetition factor. n is the
    // same sum, ties unchanged.
    docs.select(w).filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("__nw"))
      .select(col("__nw"), explode(zip_with(
        slice(chars, lit(1), size(chars) - 1),
        slice(chars, lit(2), size(chars) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("__nw")).as("n"))
      .orderBy(col("n").desc, col("x"), col("y"))
      .limit(k)
  }

  /** One merge pass over a symbol array: left-to-right, non-
    * overlapping, state = the emitted token string (space-joined; BPE
    * symbols never contain spaces). Mirrors DuckDB's
    * `list_reduce(l, (acc, t) -> ...)` exactly: the first symbol
    * seeds the accumulator, the rest fold. */
  private def mergeFold(arr: Column, x: String, y: String): Column =
    aggregate(
      slice(arr, lit(2), greatest(lit(0), size(arr) - 1)),
      element_at(arr, 1),
      (acc, t) => {
        val last = substring_index(acc, " ", -1)
        when(last === lit(x) && t === lit(y),
          concat(acc.substr(lit(1), length(acc) - length(last)),
            lit(x + y)))
          .otherwise(concat(acc, lit(" "), t))
      })

  /** A word's BPE pieces after applying `merges` in rank order.
    *
    * CRITICAL shape (the q128 FWHT lesson, string-state variant):
    * [[mergeFold]] references its input array THREE times (slice,
    * element_at, size). Chaining stages by passing stage k's
    * expression directly as stage k+1's input re-evaluates the whole
    * prefix per reference — 3^merges blowup (measured: 60s for 500
    * docs at 6 merges). Instead the inter-stage state is a token
    * STRING bound to a lambda variable through a single-element
    * `transform`, so each stage's input is referenced exactly once
    * and the three split() calls inside a stage re-split a bound
    * string, not the pipeline. */
  private def wordPieces(w: Column,
      merges: Seq[(String, String)]): Column = {
    val chars = transform(sequence(lit(1), length(w)),
      i => w.substr(i, lit(1)))
    val s0 = array_join(chars, " ")
    val sN = merges.foldLeft(s0) { case (s, (x, y)) =>
      element_at(
        transform(array(s), v => mergeFold(split(v, " "), x, y)), 1)
    }
    split(sN, " ")
  }

  /** Greedy BPE vocabulary induction (the training loop the reference
    * recipe runs once per corpus; Sennrich §3.2): `rounds` iterations
    * of count-pairs → take the (n DESC, x, y) argmax → merge it
    * everywhere → repeat. Returns the induced merge table in rank
    * order with each pair's frequency AT SELECTION TIME.
    *
    * Like every real BPE trainer, the loop runs over the WORD-
    * FREQUENCY table, not the corpus: one corpus pass aggregates
    * (word, count), and all subsequent rounds touch only distinct
    * words with pair counts weighted by word frequency — at 100 TB
    * that is the difference between re-scanning petabytes per merge
    * and re-scanning a ~10⁸-row cached vocabulary. Per round: one
    * scan of the persisted vocabulary (explode adjacent symbol pairs
    * → one weighted hash agg → a 1-row collect), then one bound
    * merge-fold projection producing the next round's vocabulary,
    * persisted while the previous one unpersists — lineage stays one
    * stage deep no matter how many rounds run. The loop is inherently
    * sequential in rounds (merge r+1's counts depend on merge r);
    * that is the algorithm, not a Spark limitation.
    *
    * Induction state and [[applyMerges]] agree by construction: the
    * trainer's round-k vocabulary equals applying the first k merges
    * in rank order, one full left-to-right pass each — which is
    * exactly what applyMerges does — so a corpus tokenized with the
    * trained table reproduces the trainer's final state (pinned in
    * BpeSpec). */
  def trainMerges(docs: DataFrame, textCol: String,
      rounds: Int): Seq[(String, String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    import org.apache.spark.storage.StorageLevel
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 2) // 1-char words never pair
      .groupBy(col("word")).agg(count(lit(1)).as("nw"))
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    var vocab = words.select(col("nw"), array_join(chars, " ").as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var prev: Option[DataFrame] = None
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val arr = split(col("syms"), " ")
      val best = vocab
        .select(col("nw"), explode(zip_with(
          slice(arr, lit(1), size(arr) - 1),
          slice(arr, lit(2), size(arr) - 1),
          (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("nw")).as("n"))
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1).collect()
      if (best.isEmpty) dry = true // every word fully merged
      else {
        val x = best(0).getString(0)
        val y = best(0).getString(1)
        out += ((x, y, best(0).getLong(2)))
        // apply ONLY the new merge to the previous round's persisted
        // state — the single-element transform binds the fold input
        // so the three split() references inside mergeFold re-split a
        // bound string, not the upstream plan (the wordPieces lesson).
        // The parent stays cached until the NEXT round's argmax collect
        // has materialized this frame (r18: the eager next.count() was
        // one extra job per round whose only purpose was ordering the
        // unpersist; deferring the unpersist one round gets the same
        // one-stage-deep lineage with half the actions — at most two
        // vocabulary generations are cached at once, same as before,
        // where parent+child coexisted during the count()).
        val next = vocab.select(col("nw"),
          element_at(transform(array(col("syms")),
            v => mergeFold(split(v, " "), x, y)), 1).as("syms"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev.foreach(_.unpersist()) // materialized by THIS round's collect
        prev = Some(vocab)
        vocab = next
      }
      r += 1
    }
    prev.foreach(_.unpersist())
    vocab.unpersist()
    out.toSeq
  }

  /** [[trainMerges]] as a gate-able frame: (rank 1.., x, y, n). */
  def trainMergesDf(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, rounds).zipWithIndex
      .map { case ((x, y, n), i) => ((i + 1).toLong, x, y, n) }
      .toDF("rank", "x", "y", "n")
  }

  /** Tokenize with a fixed merge table. Output: (doc_id, bpe, n_sym)
    * where `bpe` joins each word's pieces with spaces and words with
    * " | ", and n_sym counts pieces. The piece computation is
    * evaluated twice per row (once for the string, once inside the
    * count) — a bounded 2×, accepted to keep the operator a
    * collapse-safe single projection. */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(col(textCol), " "),
      w => length(w) > lit(0))
    val bpe = array_join(
      transform(words, w => array_join(wordPieces(w, merges), " ")),
      " | ")
    docs.select(col(idCol).as("doc_id"), bpe.as("bpe"),
      (size(split(bpe, " ")) - (size(words) - lit(1)))
        .cast("long").as("n_sym"))
  }
}
