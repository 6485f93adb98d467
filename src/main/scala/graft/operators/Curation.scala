package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end document-quality FUNNEL — the Gopher rule family
  * (Rae et al. 2021, arXiv:2112.11446 table A1) evaluated as one pass
  * that emits, for EVERY document, a keep/drop verdict plus the full
  * set of fired rules. Pipelines run exactly this shape before any
  * cross-document work: per-doc signals → thresholds → verdict, and
  * they need the reasons (not just the bit) for curation telemetry and
  * threshold tuning.
  *
  * Every rule is INTEGER-exact — token counts, summed token lengths,
  * lexicon hits, top-2-gram occurrence counts, compared by
  * cross-multiplication (chars·10 vs threshold·tokens; top2·2·100 vs
  * pct·tokens) — so the verdict is a pure function of the text with no
  * float anywhere, and a SQL oracle replays the whole funnel
  * bit-exactly. Reasons concatenate in a fixed rule order, so the
  * reason string is deterministic too.
  */
object Curation {

  /** Rule names in emission order. */
  val RuleOrder: Seq[String] =
    Seq("too_short", "too_long", "word_len", "stopwords", "repetition")

  /** Evaluate the funnel. Output: (doc_id, n_tokens, reasons — comma-
    * joined fired rules in [[RuleOrder]], "" when clean — and kept).
    * Thresholds: token-count bounds, mean-word-length bounds expressed
    * ×10 (minAvgWordLenX10 = 30 means 3.0 chars/word), a minimum
    * stopword hit count (the "is it prose" test), and the maximum
    * fraction of tokens the most common 2-gram may occupy, in percent
    * (Gopher drops at 20%; occurrences count overlapping windows ×2
    * tokens each, like [[Repetition.profile]]).
    *
    * Scale shape: ONE stateless projection — ZERO shuffles, zero
    * joins, nothing driver-side. Even the top-2-gram count stays
    * per-row: sort the doc's 2-gram array, fold it for the longest
    * run of equal neighbours (occurrences of the modal 2-gram) — an
    * explode + (doc, gram) aggregate would be correct too, but it
    * ships every gram of every document through an exchange to
    * compute a per-document number; per-row sort+fold costs
    * O(g log g) inside the scan and makes the funnel directly usable
    * on a STREAMING frame (verdict-on-ingest; StreamingSpec pins
    * stream == batch). Short docs (< 2 tokens) have no 2-gram and
    * fold to a zero count — the funnel is total. */
  def gopherFunnel(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minAvgWordLenX10: Long = 30, maxAvgWordLenX10: Long = 100,
      minStopwords: Long = 2, maxTop2Pct: Long = 20,
      stopwords: Seq[String] = langLexicons("en")): DataFrame = {
    val t = col(textCol)
    // modal-2-gram occurrence count per row: sort the gram array and
    // fold for the longest run of equal neighbours. The initial
    // prev = "" cannot be a gram (grams of two empty tokens join to
    // " "), and even a collision would start the run at 0+1 = 1 —
    // the same value a fresh run gets.
    val top2 = aggregate(
      array_sort(positionalShingles(t, 2)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (a, g) => {
        val run = when(g === a.getField("prev"),
          a.getField("run") + 1).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))
    val base = docs.select(col(idCol).as("doc_id"),
      nTokens(t).as("__n"),
      aggregate(transform(tokens(t), w => length(w).cast("long")),
        lit(0L), (a, x) => a + x).as("__chars"),
      lexiconHits(t, stopwords).as("__stop"),
      top2.as("__top2"))
    val n = col("__n")
    val reasons = concat_ws(",",
      when(n < minTokens, lit("too_short")),
      when(n > maxTokens, lit("too_long")),
      when(col("__chars") * 10 < n * minAvgWordLenX10 ||
        col("__chars") * 10 > n * maxAvgWordLenX10, lit("word_len")),
      when(col("__stop") < minStopwords, lit("stopwords")),
      when(col("__top2") * 2 * 100 >= n * maxTop2Pct,
        lit("repetition")))
    base.select(col("doc_id"), n.as("n_tokens"), reasons.as("reasons"))
      .withColumn("kept", col("reasons") === "")
  }

  /** Per-document CHARACTER-level junk signals, all exact integers —
    * the cheap filters that catch what token-level rules can't see
    * (key-mash, "aaaa…", "!!!!" padding, binary-ish spillover):
    *
    *  - `simpson_num` = Σ_c n_c·(n_c−1) over character frequencies —
    *    the Simpson concentration numerator (probability ×N(N−1) that
    *    two random character draws match). EXACT integer, unlike the
    *    Shannon-entropy formulation whose ln() would force a rank
    *    surface; `concentration` divides by N(N−1) once, for
    *    thresholding (0 = all distinct, 1 = one repeated char).
    *  - `max_char_run` — longest run of one repeated character, the
    *    direct "!!!!!!" detector.
    *
    * Scale shape: ONE stateless projection, zero shuffles — frequency
    * counts come from a sort+fold over the char array (the
    * [[gopherFunnel]] modal-2-gram trick) and the run length from the
    * same fold over the UNSORTED array; streaming-safe like the
    * funnel. */
  def charStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val chars = filter(split(col(textCol), ""), c => c =!= "")
    // fold(chars) → struct(prev, run, acc) where acc accumulates
    // f(run) at each run boundary; finish adds the last run's f.
    def runFold(arr: Column, f: Column => Column): Column =
      aggregate(arr,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
        (a, ch) => {
          val same = ch === a.getField("prev")
          struct(ch.as("prev"),
            when(same, a.getField("run") + 1).otherwise(lit(1L))
              .as("run"),
            when(same, a.getField("acc"))
              .otherwise(a.getField("acc") + f(a.getField("run")))
              .as("acc"))
        },
        a => a.getField("acc") + f(a.getField("run")))
    def maxRunFold(arr: Column): Column =
      aggregate(arr,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (a, ch) => {
          val run = when(ch === a.getField("prev"),
            a.getField("run") + 1).otherwise(lit(1L))
          struct(ch.as("prev"), run.as("run"),
            greatest(a.getField("best"), run).as("best"))
        },
        a => a.getField("best"))
    val n = length(col(textCol)).cast("long")
    docs.select(col(idCol).as("doc_id"), n.as("n_chars"),
      runFold(array_sort(chars), r => r * (r - 1)).as("simpson_num"),
      maxRunFold(chars).as("max_char_run"))
      .withColumn("concentration",
        when(col("n_chars") >= 2,
          col("simpson_num").cast("double") /
            (col("n_chars") * (col("n_chars") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Corpus-level boilerplate mining — the top-k n-grams by DOCUMENT
    * frequency above a floor: the list a curation pass reviews and
    * turns into its line/span blocklists (the C4-style filters consume
    * exactly such lists; this op is where they come from). Document
    * frequency, not term frequency: a gram repeated 100× in one spammy
    * doc is that doc's problem (q97/q130's within-doc signals), while
    * a gram in 10⁶ DIFFERENT docs is template boilerplate.
    *
    * Scale shape: per-doc DISTINCT shingles in the scan stage (so the
    * aggregate's input is at most one row per (doc, gram) — no
    * countDistinct shuffle of raw instances), ONE gram-keyed hash-agg
    * with map-side partial combine, the df floor applied before the
    * top-k, and the top-k itself a TakeOrderedAndProject heap —
    * (df DESC, gram) total order, no global sort. The boilerplate
    * mega-gram is a single hot reduce key whose partials combine
    * map-side. */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, minDf: Long): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(distinctShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("gram"))
      .limit(k)

  /** Quantile normalization across groups — map every group's
    * empirical score distribution onto the GLOBAL one (the r-th of a
    * group's n_g values becomes the ceil(r·N/n_g)-th of all N values):
    * the calibration step before a single corpus-wide threshold can be
    * applied to per-source quality scores whose scales drifted (one
    * feed's classifier says 0.9 where another's says 0.6 for the same
    * quality — rank structure is what transfers, so ranks are what
    * normalization preserves). The batch-analytics sibling of
    * microarray quantile normalization; everything is exact: ranks,
    * the ceil index arithmetic, and the substituted values are actual
    * corpus values.
    *
    * Scale shape: the GLOBAL rank comes from the [[PrefixSum]]
    * distributed scan (range-partition + per-partition index + offset
    * broadcast — never a single-partition window); per-group ranks are
    * one partitioned window; the substitution is one join keyed by the
    * target rank. Output: input rows + (rank_grp, norm). */
  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("grp"),
      col(valCol).cast("long").as("v"), col(tieCol).as("tb"))
    val global = PrefixSum.withRunningTotal(
        base.withColumn("__one", lit(1L)), Seq("v", "tb"), "__one")
      .select(col("v").as("__gv"), col("__one_cum").as("__gr"))
      .localCheckpoint(false) // the N count below must see the same frame
    val n = global.count()
    val wg = Window.partitionBy(col("grp")).orderBy(col("v"), col("tb"))
    val ranked = base
      .withColumn("rank_grp", row_number().over(wg).cast("long"))
      .withColumn("__ng", count(lit(1)).over(
        Window.partitionBy(col("grp"))))
      .withColumn("__gi",
        expr(s"(rank_grp * ${n}L + __ng - 1L) div __ng"))
    ranked.join(global, col("__gi") === col("__gr"))
      .select(col("grp"), col("tb"), col("v"), col("rank_grp"),
        col("__gv").as("norm"))
  }

  /** Robust per-group outlier census via median/MAD (the
    * median-absolute-deviation rule: |x − med| > k·MAD) — the outlier
    * detector that survives the outliers themselves, unlike
    * mean/stddev z-scores which the anomalies drag toward themselves.
    * Everything is EXACT: med and MAD are order statistics (value at
    * ceil(n/2) of the tiebroken sort — the q164 selection rule, not
    * interpolation), deviations are integer |v−med|, and the flag is
    * an integer comparison, so the census is engine-portable with no
    * tolerance.
    *
    * Output: (grp, n, med, mad, n_out). Scale shape: two partitioned
    * row_number windows (values, then deviations — the per-group sort
    * bound of q164 applies) with the one-row-per-group med/mad frames
    * joined back group-keyed; the final census is one agg. */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
      tieCol: String, k: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(col(groupCol).as("grp"),
      col(valCol).cast("long").as("v"), col(tieCol).as("tb"))
    def pickMid(in: DataFrame, c: String): DataFrame = {
      val w = Window.partitionBy(col("grp")).orderBy(col(c), col("tb"))
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col("grp"))))
        .filter(col("__rn") === expr("(2 * __n + 3) div 4"))
        .select(col("grp"), col(c).as(s"__mid_$c"),
          col("__n").as(s"__n_$c"))
    }
    val med = pickMid(base, "v")
    val dev = base.join(med, Seq("grp"))
      .withColumn("d", abs(col("v") - col("__mid_v")))
    val mad = pickMid(dev.select(col("grp"), col("d"), col("tb")), "d")
    dev.join(mad, Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("__n_v")).as("n"),
        max(col("__mid_v")).as("med"),
        max(col("__mid_d")).as("mad"),
        sum(when(col("d") > lit(k) * col("__mid_d"), 1L)
          .otherwise(0L)).as("n_out"))
  }
}
