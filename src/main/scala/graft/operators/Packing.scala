package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — mapping a tokenized corpus onto fixed-length
  * training sequences, the step between curation and the training
  * loader. This is GPT-style "concat and chunk" (the packing used for
  * large pretraining runs: concatenate documents in a deterministic
  * order, cut every `seqLen` tokens, let documents straddle cuts):
  * exact, order-stable, and embarrassingly parallel, unlike best-fit
  * bin packing whose greedy loop is inherently sequential.
  *
  * Built on [[PrefixSum.withRunningTotal]] (the two-pass distributed
  * scan): each document's global token offset is the exclusive prefix
  * sum of token counts over the id order, and every placement fact a
  * loader needs is integer arithmetic on that offset — which sequence
  * the document starts in, where inside it, and how many sequences it
  * spans. No joins beyond the scan's own P-row broadcast, no window
  * over the whole corpus in one task.
  */
object Packing {

  /** Pack by concat-and-chunk. Input needs a unique numeric/orderable
    * `idCol` and a precomputed token count column `nTokensCol`; the
    * corpus order is `orderCols` when given (must be total — end with
    * the id; e.g. a deterministic md5 shuffle key first, the standard
    * "shuffle then chunk" training order), else the id order. Output
    * per document: n_tokens,
    * tok_start (global exclusive offset), first_seq / last_seq (the
    * `seqLen`-token sequences the document touches; a zero-token doc
    * reports first_seq == last_seq), and seq_offset (position inside
    * first_seq). */
  def concatChunk(docs: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Long, orderCols: Seq[String] = Nil): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val ord = if (orderCols.isEmpty) Seq("doc_id")
              else orderCols.map { c => if (c == idCol) "doc_id" else c }
    val withCum = PrefixSum.withRunningTotal(
      docs.select((col(idCol).as("doc_id") +:
        col(nTokensCol).cast("long").as("__n") +:
        orderCols.filter(_ != idCol).map(col)): _*),
      ord, "__n")
    val start = col("__n_cum") - col("__n")
    withCum.select(col("doc_id"), col("__n").as("n_tokens"),
      start.as("tok_start"),
      expr(s"(__n_cum - __n) div $seqLen").as("first_seq"),
      when(col("__n") > 0, expr(s"(__n_cum - 1) div $seqLen"))
        .otherwise(expr(s"(__n_cum - __n) div $seqLen")).as("last_seq"),
      (start % seqLen).as("seq_offset"))
  }

  /** Aligned packing — pack documents onto fixed-`seqLen` training
    * sequences with ZERO cross-sequence straddling, the
    * cross-contamination-free alternative to [[concatChunk]]. Each
    * document pads to the next power of two (the standard
    * length-bucketing quantization, e.g. TensorFlow's
    * bucket_by_sequence_length) and the corpus lays out in
    * (pad DESC, id) order by global prefix sum. Buddy-allocation
    * alignment (Knowlton 1965 / Knuth TAOCP vol. 1 §2.5) makes the
    * layout valid with NO bin state at all: every earlier pad length
    * is a ≥ power of two, so each document's global start offset is a
    * multiple of its own pad length, hence `start mod seqLen` +
    * pad ≤ seqLen — no document ever crosses a sequence boundary.
    *
    * Why this shape at 100 TB: first-fit/best-fit greedy packing keeps
    * an open-bin state that is inherently sequential and grows with
    * the corpus (billions of bins at pretraining scale — a driver-side
    * plan cannot hold them); this layout is one distributed
    * [[PrefixSum]] scan plus per-row integer arithmetic, with the
    * padding waste (strictly < 2× per document, exact per-row in
    * `waste`) as the known, bounded price.
    *
    * Contract: documents longer than `seqLen` tokens raise in-plan
    * (truncate or filter upstream — same as any fixed-length loader).
    * Zero-token documents pad to 1 slot. Output per document: n_tokens,
    * pad_len, bin (which training sequence), bin_offset (start inside
    * it), waste (= pad_len − n_tokens). */
  def alignedPack(docs: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1 && (seqLen & (seqLen - 1)) == 0,
      s"seqLen must be a power of two, got $seqLen")
    val levels = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= seqLen).toSeq
    val n = col("__n")
    val pad = levels.tail.foldLeft(when(n <= levels.head, levels.head)) {
        (acc, p) => acc.when(n <= p, p)
      }.otherwise(raise_error(concat(
        lit(s"alignedPack: document longer than seqLen=$seqLen: "),
        col("doc_id").cast("string"))).cast("long"))
      .cast("long")
    val withCum = PrefixSum.withRunningTotal(
      docs.select(col(idCol).as("doc_id"),
          col(nTokensCol).cast("long").as("__n"))
        .withColumn("__pad", pad)
        .withColumn("__negp", -col("__pad")),
      Seq("__negp", "doc_id"), "__pad")
    withCum.select(col("doc_id"), col("__n").as("n_tokens"),
      col("__pad").as("pad_len"),
      expr(s"(__pad_cum - __pad) div $seqLen").as("bin"),
      ((col("__pad_cum") - col("__pad")) % seqLen).as("bin_offset"),
      (col("__pad") - col("__n")).as("waste"))
  }

  /** Token-budget selection — the "take the best N tokens" cut that
    * ends every data-selection pass (DSIR/classifier ranks in, a token
    * budget out): walk documents in the caller's PRIORITY order
    * (`orderCols`, which must be total — end with the unique id; put a
    * negated score column first for descending priority) and keep
    * every document whose span STARTS inside the budget — the
    * straddling document is kept whole, the standard inclusive cut, so
    * the selection is never empty when the budget is positive and
    * total selected tokens < budget + max doc length. Output: the
    * selected docs as (doc_id, n_tokens, tok_start — tokens consumed
    * by higher-priority docs).
    *
    * Scale shape: [[PrefixSum.withRunningTotal]]'s two-pass scan plus
    * one pushed filter — no single-task window, no collect beyond the
    * P-element offset scan. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String,
      nTokensCol: String, orderCols: Seq[String],
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val ord = orderCols.map { c => if (c == idCol) "doc_id" else c }
    val withCum = PrefixSum.withRunningTotal(
      docs.select((col(idCol).as("doc_id") +:
        col(nTokensCol).cast("long").as("__n") +:
        orderCols.filter(_ != idCol).map(col)): _*),
      ord, "__n")
    withCum.select(col("doc_id"), col("__n").as("n_tokens"),
      (col("__n_cum") - col("__n")).as("tok_start"))
      .filter(col("tok_start") < budget)
  }
}
