package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 64(328) 1969)
  * — the structured-data twin of the text near-dup family: decide
  * which rows of two tables describe the SAME entity by summing
  * per-field agreement weights (the log-odds ln(m_f/u_f) of each
  * field agreeing on a true match vs a random pair), then thresholding
  * into match / possible / non-match. This is how a pipeline
  * reconciles entity tables across sources (user records, document
  * registries, supplier catalogs) where no shared key exists.
  *
  * Weights are caller-supplied SCALED INTEGERS (log-odds × 1000, the
  * fixture-weights pattern of the q110 classifier): scores are exact
  * long sums, so the gate hash-matches — no floating-point
  * probabilities anywhere. Field agreement is null-safe equality
  * (`<=>`): a null field agrees only with a null field, and
  * disagreement contributes the (negative) disagreement weight.
  *
  * Scale shape: candidate generation is a BLOCKED equi-join — only
  * rows sharing the blocking key are compared, turning the O(|A|·|B|)
  * all-pairs into Σ_b |A_b|·|B_b| with one shuffle per side keyed on
  * the block (AQE splits skewed blocks). The per-pair score is a
  * stateless projection inside the join stage, and `minScore` prunes
  * the output BEFORE it ever reaches an exchange — the same
  * bounded-candidates discipline as the LSH pair generators. Never a
  * cross join; a hot block costs |A_b|·|B_b| like any banded join,
  * so cap block sizes upstream the way the LSH family caps buckets
  * if keys can degenerate. */
object Linkage {

  /** One comparison field: rows agree when `colName` is null-safe
    * equal across the two sides; agreement adds `wAgree` (positive),
    * disagreement adds `wDisagree` (negative). */
  final case class FieldRule(colName: String, wAgree: Long, wDisagree: Long)

  /** Score all blocked pairs between `a` and `b` and classify.
    * Both frames must carry `blockCols`, every `FieldRule.colName`,
    * and their id columns. Output: (a_id, b_id, n_agree, score,
    * verdict) for pairs with score >= minScore; verdict is 'match'
    * for score >= tMatch else 'possible'. */
  /** `maxBlock` is the LSH-maxBucket discipline applied to blocking:
    * blocks whose A-side (registry) population exceeds it are dropped
    * ENTIRELY — a degenerate key value (one giant nation, a default
    * placeholder) would otherwise cost |A_b|·|B_b| like any banded
    * join. Deterministic and oracle-replayable (the gate recomputes
    * capped semantics, the q95/q104 pattern); the default leaves the
    * plan untouched. */
  def scorePairs(a: DataFrame, b: DataFrame, idColA: String,
      idColB: String, blockCols: Seq[String], fields: Seq[FieldRule],
      minScore: Long, tMatch: Long,
      maxBlock: Int = Int.MaxValue): DataFrame =
    scored(a, b, idColA, idColB, blockCols, fields, minScore, tMatch,
      broadcastRight = false, maxBlock)

  /** Incremental linkage — the ingest-time shape: link a (small)
    * DELTA of new records against a (huge) standing registry. Same
    * semantics as [[scorePairs]] with `a` = registry, `b` = delta,
    * but the delta is BROADCAST, so the registry is ONE scan with the
    * block-key probe and the per-pair score inline — the registry
    * never feeds an exchange (the q82/q150 incremental-operator
    * contract, plan-pinned in LinkageSpec). Use when
    * |delta| × row width fits a broadcast (the usual batch-ingest
    * case); fall back to [[scorePairs]] for registry-vs-registry.
    *
    * This is also the STREAMING shape: pair scores are per-(registry
    * row, delta row) and blocking is registry-side, so the operator
    * is micro-batch decomposable — run it per batch under
    * `foreachBatch` and the union of batch outputs equals one batch
    * run over the whole delta (StreamingSpec pins the equality). */
  def scorePairsIncremental(registry: DataFrame, delta: DataFrame,
      idColA: String, idColB: String, blockCols: Seq[String],
      fields: Seq[FieldRule], minScore: Long, tMatch: Long,
      maxBlock: Int = Int.MaxValue): DataFrame =
    scored(registry, delta, idColA, idColB, blockCols, fields,
      minScore, tMatch, broadcastRight = true, maxBlock)

  private def scored(a: DataFrame, b: DataFrame, idColA: String,
      idColB: String, blockCols: Seq[String], fields: Seq[FieldRule],
      minScore: Long, tMatch: Long, broadcastRight: Boolean,
      maxBlock: Int): DataFrame = {
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(fields.nonEmpty, "need at least one comparison field")
    require(tMatch >= minScore,
      s"tMatch=$tMatch must be >= minScore=$minScore")
    fields.foreach { f =>
      require(f.wAgree > f.wDisagree,
        s"field ${f.colName}: agreement weight must exceed " +
          s"disagreement (${f.wAgree} <= ${f.wDisagree})") }
    val la = a.select((idColA +: blockCols ++: fields.map(_.colName))
      .distinct.map(c => col(c).as(s"__a_$c")): _*)
    val lb = b.select((idColB +: blockCols ++: fields.map(_.colName))
      .distinct.map(c => col(c).as(s"__b_$c")): _*)
    // STRICT equality on the block: a null blocking key yields no
    // candidates (null-safe equality here would pool every
    // missing-key row into one degenerate mega-block — the same skew
    // bomb the LSH family caps buckets against)
    // the block cap: one partial+final agg over A's block keys (one
    // aggregated row per distinct block rides the exchange, never A's
    // rows) and an inner equi-join back — AQE-splittable, and the
    // default maxBlock leaves the plan untouched
    val laCapped =
      if (maxBlock == Int.MaxValue) la
      else {
        val keep = la
          .groupBy(blockCols.map(c => col(s"__a_$c")): _*)
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= maxBlock)
          .drop("__bn")
        la.join(keep, blockCols.map(c => s"__a_$c"))
      }
    val on = blockCols.map(c => col(s"__a_$c") === col(s"__b_$c"))
      .reduce(_ && _)
    def agree(f: FieldRule): Column =
      col(s"__a_${f.colName}") <=> col(s"__b_${f.colName}")
    val score = fields.map(f =>
        when(agree(f), lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    val nAgree = fields.map(f =>
        when(agree(f), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    laCapped.join(if (broadcastRight) broadcast(lb) else lb, on)
      .select(col(s"__a_$idColA").as("a_id"),
        col(s"__b_$idColB").as("b_id"),
        nAgree.as("n_agree"), score.as("score"))
      .filter(col("score") >= minScore)
      .withColumn("verdict",
        when(col("score") >= tMatch, lit("match"))
          .otherwise(lit("possible")))
  }
}
