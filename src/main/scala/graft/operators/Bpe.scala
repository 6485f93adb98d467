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
    docs.select(w).filter(length(col("word")) >= 2)
      .select(explode(zip_with(
        slice(chars, lit(1), size(chars) - 1),
        slice(chars, lit(2), size(chars) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("n"))
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
