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
    * `idCol` (the deterministic corpus order) and a precomputed token
    * count column `nTokensCol`. Output per document: n_tokens,
    * tok_start (global exclusive offset), first_seq / last_seq (the
    * `seqLen`-token sequences the document touches; a zero-token doc
    * reports first_seq == last_seq), and seq_offset (position inside
    * first_seq). */
  def concatChunk(docs: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val withCum = PrefixSum.withRunningTotal(
      docs.select(col(idCol).as("doc_id"),
        col(nTokensCol).cast("long").as("__n")),
      Seq("doc_id"), "__n")
    val start = col("__n_cum") - col("__n")
    withCum.select(col("doc_id"), col("__n").as("n_tokens"),
      start.as("tok_start"),
      expr(s"(__n_cum - __n) div $seqLen").as("first_seq"),
      when(col("__n") > 0, expr(s"(__n_cum - 1) div $seqLen"))
        .otherwise(expr(s"(__n_cum - __n) div $seqLen")).as("last_seq"),
      (start % seqLen).as("seq_offset"))
  }
}
