package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Bigram language-model perplexity scoring — the CCNet/KenLM-style
  * fluency signal of training-data curation: documents whose token
  * transitions are unlikely under a reference corpus (boilerplate,
  * shuffled text, lorem-ipsum junk, wrong-language leakage) score low
  * and get filtered or down-weighted. Here the reference corpus is the
  * scored corpus itself (self-perplexity, the usual bootstrap before a
  * curated LM exists), but `bigramLm` accepts any training frame.
  *
  * Model: add-one (Laplace) smoothed bigram LM over whitespace tokens,
  *   P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V),
  * scored as the mean log-probability over a document's bigrams.
  *
  * Scale shape (100 TB): training is two partial+final count
  * aggregations shuffled on the gram/token key (associative counts —
  * hot boilerplate grams combine map-side, no single-reducer funnel).
  * c(w1) is denormalized INTO the LM at train time — one equi-join on
  * the first token over the DISTINCT-gram table (far smaller than the
  * bigram instance stream), so scoring needs exactly ONE join: doc
  * bigram instances ⋈ LM on the gram key, AQE free to broadcast a
  * small LM or skew-split a hot gram. The vocabulary size rides as a
  * broadcast 1-row frame, the per-doc reduce is a partial+final mean,
  * and top-k ranking is a TakeOrderedAndProject. Tokenization is the
  * native single-pass [[graft.expressions.WordShinglesAll]] (n=2), so
  * per-row cost is O(tokens), not O(tokens²).
  *
  * Cross-engine numerics: the log INPUT (c12+1)/(c1+V) is a correctly
  * rounded double of exact integers in any engine; ln() itself differs
  * in the last ulp between libm implementations, so the gate surface
  * is the id-tiebroken RANK of the mean log-prob, never the raw double
  * (the q77 BM25 rule).
  */
object NgramLm {

  /** (gram, c12, c1) for every distinct bigram of `train`, with the
    * first-token unigram count denormalized in. */
  def bigramLm(train: DataFrame, textCol: String): DataFrame = {
    val toks = train.select(
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val bi = train.select(explode(
        TextFunctions.positionalShingles(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    bi.join(uni, substring_index(col("gram"), " ", 1) === col("tok"))
      .select(col("gram"), col("c12"), col("c1"))
  }

  /** Vocabulary size of `train` as a broadcastable 1-row frame. */
  def vocabSize(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("__v"))

  /** Mean bigram log-probability per document under `lm`/`vocab`
    * (typically [[bigramLm]]/[[vocabSize]] of a reference corpus).
    * Output (idCol, n_bigrams, logprob); documents with fewer than two
    * tokens have no bigrams and are dropped (no transitions to judge).
    * Out-of-vocabulary bigrams back off to c12=0, and an unseen first
    * token to c1=0 — the Laplace floor 1/V. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, vocab: DataFrame): DataFrame = {
    val grams = docs.select(col(idCol), explode(
      TextFunctions.positionalShingles(col(textCol), 2)).as("gram"))
    grams
      .join(lm, Seq("gram"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)).cast("double") +
            col("__v").cast("double"))).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lp")) / count(lit(1))).as("logprob"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): split each language's documents into head/middle/tail
    * TERCILES by LM fluency — the standard web-corpus quality
    * partition (train on head+middle, inspect or drop tail). Scores
    * come from [[scoreDocs]] under the corpus's own bigram LM; buckets
    * are exact integer-rank cuts (3·rank ≤ n / ≤ 2n) in
    * (logprob DESC, id) order, so only documents at a tercile BOUNDARY
    * depend on score comparisons — boundary gaps on the reference
    * corpus are ≥ 3.6e-5, nine orders above double-sum noise (the q94
    * rank-surface argument; raw doubles never cross the gate).
    *
    * Scale shape: per-language ranks via [[PrefixSum]]'s two-pass
    * range-partitioned scan over (lang, −logprob, id) — NOT a
    * `Window.partitionBy(lang)`, which would funnel each language
    * through ONE task (a 20 TB partition for the head language at
    * corpus scale). Each language's rank base is its min global
    * running total (one language-count agg, broadcast back); docs with
    * fewer than two tokens have no bigrams and are dropped, matching
    * [[scoreDocs]]. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String): DataFrame = {
    val scored = scoreDocs(docs, idCol, textCol,
        bigramLm(docs, textCol), vocabSize(docs, textCol))
      .join(docs.select(col(idCol), col(strataCol)), Seq(idCol))
    val ranked = PrefixSum.withRunningTotal(
      scored.select(col(idCol).as("doc_id"),
        col(strataCol).as("__g"), (-col("logprob")).as("__neg"),
        lit(1L).as("__one")),
      Seq("__g", "__neg", "doc_id"), "__one")
    val base = ranked.groupBy(col("__g"))
      .agg(min(col("__one_cum")).as("__base"),
        count(lit(1)).as("__n"))
    ranked.join(broadcast(base), Seq("__g"))
      .select(col("doc_id"), col("__g").as(strataCol),
        when(lit(3) * (col("__one_cum") - col("__base") + 1) <= col("__n"),
            lit("head"))
          .when(lit(3) * (col("__one_cum") - col("__base") + 1) <=
            lit(2) * col("__n"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The `k` least fluent documents under the corpus's own bigram LM —
    * the junk-candidate list, ranked worst (lowest mean log-prob)
    * first with the id breaking ties. Returns (idCol, rk). */
  def worstK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    scoreDocs(docs, idCol, textCol,
        bigramLm(docs, textCol), vocabSize(docs, textCol))
      .orderBy(col("logprob").asc, col(idCol)).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("logprob").asc, col(idCol))).cast("long"))
      .select(col(idCol), col("rk"))

  /** Interpolated Kneser–Ney bigram LM (Kneser & Ney, ICASSP 1995;
    * Chen & Goodman, CL 1999 eq. 4.27) — the smoothing KenLM/CCNet
    * actually ship, next to [[bigramLm]]'s Laplace baseline:
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * with D = 3/4. The continuation probability N1+(·w2)/N1+(··)
    * (how many distinct left-contexts w2 follows, over all distinct
    * bigram types) is what fixes Laplace's "Francisco problem":
    * frequent-but-bound tokens stop stealing mass from genuinely
    * free-floating ones.
    *
    * Cross-engine exactness: D = 3/4 keeps every probability a ratio
    * of exact integers — the score is t1 + t2 with
    * t1 = max(4·c12−3, 0)/(4·c1) and
    * t2 = 3·N1w·Ncont / (4·c1·NB), each term ONE double division of
    * double products of exact longs, summed once — so both engines
    * build the bit-identical ln input and the gate surface is the
    * id-tiebroken RANK (the q77/q94 rule).
    *
    * Scale shape: identical to [[bigramLm]] — the distinct-gram table
    * carries c12 with c(w1·) and N1+(w1·) denormalized in (one agg
    * over the DISTINCT grams, far smaller than the instance stream),
    * continuation counts are one more distinct-gram agg keyed on w2,
    * and N1+(··) is a broadcast 1-row frame. Scoring is the q94 join
    * shape plus one extra equi-join on the second token. */
  /** Distinct-gram counts (gram, c12) — the shared precursor of every
    * KN stat frame. */
  private def gramCounts(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(
        TextFunctions.positionalShingles(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c12"))

  def kneserNeyLm(train: DataFrame, textCol: String): DataFrame =
    lmFromCounts(gramCounts(train, textCol))

  private def lmFromCounts(bi: DataFrame): DataFrame = {
    val w1 = bi.groupBy(substring_index(col("gram"), " ", 1).as("__w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1w"))
    bi.join(w1, substring_index(col("gram"), " ", 1) === col("__w1"))
      .select(col("gram"), col("c12"), col("c1"), col("n1w"))
  }

  /** Continuation counts N1+(·w2): distinct left-contexts per second
    * token. Takes any frame with one row per distinct gram (the
    * trained [[kneserNeyLm]], or its distinct-gram precursor as
    * [[worstKKn]] passes) — deriving from the shared gram-agg subtree
    * instead of the corpus lets exchange reuse serve all three KN
    * stat frames from ONE distinct-gram aggregation. */
  def knContinuation(lm: DataFrame): DataFrame =
    lm.groupBy(substring_index(col("gram"), " ", -1).as("__w2"))
      .agg(count(lit(1)).as("ncont"))

  /** N1+(··) — total distinct bigram types (the lm's row count),
    * broadcastable 1-row. */
  def knTotals(lm: DataFrame): DataFrame =
    lm.agg(count(lit(1)).as("__nb"))

  /** Mean KN bigram log-probability per document. Out-of-vocabulary
    * handling is a deliberate, SQL-replayable floor: an unseen gram
    * with a KNOWN w1 backs off to the interpolation term alone
    * (c12 = 0 → t1 = 0); an unseen w1 or w2 contributes the uniform
    * continuation floor 1/(4·NB) (Laplace's 1/V in KN clothing —
    * standard KN reserves no OOV mass, and a −∞ would poison the
    * mean). Output (idCol, n_bigrams, logprob); sub-2-token docs drop
    * as in [[scoreDocs]]. */
  def scoreDocsKn(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, cont: DataFrame, totals: DataFrame): DataFrame = {
    val grams = docs.select(col(idCol), explode(
      TextFunctions.positionalShingles(col(textCol), 2)).as("gram"))
    // w1 stats re-keyed from the lm (every gram of a w1 carries the
    // same denormalized c1/n1w) so an UNSEEN gram with a known w1
    // still reaches its backoff weight — the gram-keyed left join
    // alone would lose c1/n1w exactly when backoff is needed
    val w1 = lm.groupBy(substring_index(col("gram"), " ", 1).as("__w1"))
      .agg(max(col("c1")).as("c1"), max(col("n1w")).as("n1w"))
    val d = (c: Column) => c.cast("double")
    val t1 = d(greatest(col("c12") * 4 - 3, lit(0L))) / d(col("c1") * 4)
    val t2 = (lit(3.0) * d(col("n1w")) * d(col("ncont"))) /
      (d(col("c1") * 4) * d(col("__nb")))
    val p = when(col("c1").isNull || col("ncont").isNull,
        lit(1.0) / d(col("__nb") * 4))
      .otherwise(
        when(col("c12").isNull, lit(0.0)).otherwise(t1) + t2)
    grams
      .join(lm.select(col("gram"), col("c12")), Seq("gram"), "left")
      .join(w1,
        substring_index(col("gram"), " ", 1) === col("__w1"), "left")
      .join(cont,
        substring_index(col("gram"), " ", -1) === col("__w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), log(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lp")) / count(lit(1))).as("logprob"))
  }

  /** Distinct TRIGRAM counts (gram, c123) — the one corpus pass every
    * trigram-KN stat frame derives from. */
  private def triCounts(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(
        TextFunctions.positionalShingles(col(textCol), 3)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c123"))

  private def w1Of(g: Column) = substring_index(g, " ", 1)
  private def w2Of(g: Column) =
    substring_index(substring_index(g, " ", 2), " ", -1)
  private def w3Of(g: Column) = substring_index(g, " ", -1)

  /** Interpolated Kneser–Ney TRIGRAM scoring (Chen & Goodman, CL 1999
    * §4.1.6) — [[scoreDocsKn]]'s recursion taken one order up, the
    * order production LMs actually start at:
    *
    *   P(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2·)
    *              + D·N1+(w1w2·)/c(w1w2·) · P_KN(w3|w2)
    *   P_KN(w3|w2) = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *              + D·N1+(w2·)/N1+(·w2·) · P_KN(w3)
    *   P_KN(w3)   = N1+(·w3)/N1+(··)
    *
    * with D = 3/4 at every level. EVERY lower-order stat is a
    * CONTINUATION count derived from the DISTINCT-TRIGRAM table (the
    * Chen–Goodman prescription — raw bigram counts at the middle
    * level break the per-history normalization: N1+(w2·) must count
    * the same (w2,w3) types the middle numerators sum over, which is
    * exactly what makes Σ_w3 P = 1 hold level by level, spec-proven).
    * So: one distinct-trigram subtree T feeds (a) history stats
    * c(w1w2·), N1+(w1w2·); (b) the continuation-bigram table B' =
    * distinct (w2,w3) with N1+(·w2w3); and B' feeds the middle stats,
    * the unigram continuation counts, and N1+(··) = |B'| — the q192
    * shared-subtree discipline, two gram-keyed aggs total.
    *
    * Backoff contract (each branch SQL-replayable): unseen trigram
    * with known history → t1 = 0; unseen HISTORY → pure backoff
    * P_KN(w3|w2) (the standard back-off-on-zero-context rule);
    * unseen (w2w3) with known w2 → middle t1 = 0; unseen w2 →
    * P_KN(w3); unseen w3 → uniform floor 1/(4·N1+(··)) (the q192
    * floor one level down). Numerics: D = 3/4 keeps every input
    * exact-integer; each level is (one division) + (3.0·types·p_lower)
    * / (4·denom) — a FIXED chain of correctly-rounded double ops, so
    * the ln inputs are bit-identical cross-engine and the
    * id-tiebroken RANK gates (the q77/q94 rule).
    *
    * Documents with fewer than three tokens have no trigrams and
    * drop, as in [[scoreDocs]]. `train` is the reference corpus
    * (usually the scored corpus itself — [[worstKKn3]]'s bootstrap).
    * Output (idCol, n_trigrams, logprob). */
  def scoreDocsKn3(docs: DataFrame, idCol: String, textCol: String,
      train: DataFrame): DataFrame = {
    // localCheckpoint both shared subtrees (the q192 discipline): tri
    // feeds THREE consumers (history stats, the continuation-bigram
    // table, the seen-trigram join) and bp feeds FOUR (middle stats,
    // unigram continuations, totals, the middle join) — without the
    // barrier each branch re-embeds the corpus explode+agg, and the
    // r13 plan dump showed SIX corpus scans / 13 shuffles for what is
    // two gram-keyed aggregations of one corpus pass
    val tri = triCounts(train, textCol).localCheckpoint(false)
    val hist = tri.groupBy(
        concat(w1Of(col("gram")), lit(" "), w2Of(col("gram"))).as("__h"))
      .agg(sum(col("c123")).as("c12dot"), count(lit(1)).as("n1w12"))
    val bp = tri.groupBy(
        concat(w2Of(col("gram")), lit(" "), w3Of(col("gram"))).as("__m"))
      .agg(count(lit(1)).as("nc23"))
      .localCheckpoint(false)
    val mid = bp.groupBy(w1Of(col("__m")).as("__mw2"))
      .agg(sum(col("nc23")).as("nmid2"), count(lit(1)).as("ntypes2"))
    val uni = bp.groupBy(substring_index(col("__m"), " ", -1).as("__uw3"))
      .agg(count(lit(1)).as("ncont3"))
    val totals = bp.agg(count(lit(1)).as("__nb"))
    val grams = docs.select(col(idCol), explode(
      TextFunctions.positionalShingles(col(textCol), 3)).as("gram"))
    val d = (c: Column) => c.cast("double")
    val pu = when(col("ncont3").isNull,
        lit(1.0) / d(col("__nb") * 4))
      .otherwise(d(col("ncont3")) / d(col("__nb")))
    val pbi = when(col("nmid2").isNull, pu)
      .otherwise(
        when(col("nc23").isNull, lit(0.0))
          .otherwise(d(greatest(col("nc23") * 4 - 3, lit(0L)))
            / d(col("nmid2") * 4))
        + (lit(3.0) * d(col("ntypes2")) * pu) / d(col("nmid2") * 4))
    val p = when(col("c12dot").isNull, pbi)
      .otherwise(
        when(col("c123").isNull, lit(0.0))
          .otherwise(d(greatest(col("c123") * 4 - 3, lit(0L)))
            / d(col("c12dot") * 4))
        + (lit(3.0) * d(col("n1w12")) * pbi) / d(col("c12dot") * 4))
    grams
      .join(tri, Seq("gram"), "left")
      .join(hist, concat(w1Of(col("gram")), lit(" "),
        w2Of(col("gram"))) === col("__h"), "left")
      .join(bp, concat(w2Of(col("gram")), lit(" "),
        w3Of(col("gram"))) === col("__m"), "left")
      .join(mid, w2Of(col("gram")) === col("__mw2"), "left")
      .join(uni, w3Of(col("gram")) === col("__uw3"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), log(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        (sum(col("__lp")) / count(lit(1))).as("logprob"))
  }

  /** The `k` least fluent documents under the corpus's own KN TRIGRAM
    * LM — [[worstKKn]] one order up. Returns (idCol, rk). */
  def worstKKn3(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    scoreDocsKn3(docs, idCol, textCol, train = docs)
      .orderBy(col("logprob").asc, col(idCol)).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("logprob").asc, col(idCol))).cast("long"))
      .select(col(idCol), col("rk"))

  /** The `k` least fluent documents under the corpus's own KN bigram
    * LM — [[worstK]]'s surface with the production smoothing.
    * Returns (idCol, rk). */
  def worstKKn(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // one distinct-gram subtree feeds lm, continuation counts, AND
    // totals — its exchange is canonically identical across the three
    // branches, so it shuffles once and is reused
    val bi = gramCounts(docs, textCol)
    scoreDocsKn(docs, idCol, textCol, lmFromCounts(bi),
        knContinuation(bi), knTotals(bi))
      .orderBy(col("logprob").asc, col(idCol)).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("logprob").asc, col(idCol))).cast("long"))
      .select(col(idCol), col("rk"))
  }
}
