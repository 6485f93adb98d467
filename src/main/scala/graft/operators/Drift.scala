package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus drift / keyness analysis — which tokens are statistically
  * over-represented in corpus A vs corpus B (Dunning, "Accurate
  * methods for the statistics of surprise and coincidence", CL 19(1)
  * 1993): the log-likelihood-ratio G² over each token's 2×2
  * contingency table. THE report a pipeline owner reads when a new
  * crawl snapshot lands ("what changed?"), when comparing a filtered
  * corpus against its input ("what did the filter remove?"), or when
  * auditing a source against the rest of the mix.
  *
  * G² = 2·Σ O·ln(O/E) over the four cells — computed per token from
  * exact long counts; every ln input is formed as ONE double ratio of
  * double products of exact counts (correctly rounded, so both
  * engines build bit-identical ln inputs), and the gate surface is
  * the token-tiebroken RANK, never the raw G² (the q77 rule for
  * log-bearing scores). Zero cells contribute 0 (the 0·ln 0 = 0
  * convention). `direction` reports which corpus the token is
  * enriched in by exact integer cross-multiplication
  * (a·totalB vs b·totalA).
  *
  * Scale shape: one token-count agg per corpus (partial+final,
  * map-side combine), a full-outer equi-join on the token key, totals
  * as broadcast 1-row frames, the G² expression stateless per token,
  * and top-k through TakeOrderedAndProject — no global sort, nothing
  * driver-side. */
object Drift {

  private def counts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Top-`k` drifted tokens between `a` and `b`: (rk, tok, ca, cb,
    * direction) with rk 1..k by G² descending, token tiebreak. */
  def keynessTopK(a: DataFrame, b: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // corpus token totals ARE the sums of the per-token aggregates —
    // deriving them from ca/cb instead of two extra explode+count
    // corpus passes (ADVICE r12) drops two full corpus scans; the
    // count frames are CHECKPOINTED because each feeds two consumers
    // (the token join and its total) and self-referencing subtrees
    // don't reuse exchanges (the r09 canonicalization lesson — without
    // the barrier the corpus explode re-executes per consumer and the
    // "saved" scans come straight back); coalesce keeps the
    // empty-corpus total at 0
    val ca = counts(a, textCol).select(col("tok"), col("c").as("ca"))
      .localCheckpoint(false)
    val cb = counts(b, textCol).select(col("tok"), col("c").as("cb"))
      .localCheckpoint(false)
    val ta = ca.agg(coalesce(sum(col("ca")), lit(0L)).as("__ta"))
    val tb = cb.agg(coalesce(sum(col("cb")), lit(0L)).as("__tb"))
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
    val d = (x: Column) => x.cast("double")
    val tt = col("__ta") + col("__tb")
    // one G² cell: obs·ln((obs·total)/(corpusTotal·colTotal)), formed
    // as a single division of two double products so both engines
    // build the identical ln input; empty cells contribute 0
    def cell(obs: Column, corpusTotal: Column, colTotal: Column): Column =
      when(obs === 0, lit(0.0)).otherwise(
        d(obs) * log((d(obs) * d(tt)) / (d(corpusTotal) * d(colTotal))))
    val ab = col("ca") + col("cb")
    val rest = tt - ab
    val g2 = (cell(col("ca"), col("__ta"), ab)
      + cell(col("cb"), col("__tb"), ab)
      + cell(col("__ta") - col("ca"), col("__ta"), rest)
      + cell(col("__tb") - col("cb"), col("__tb"), rest)) * lit(2.0)
    // exact integer cross-multiplication in decimal(38) — long would
    // overflow at 100 TB token totals (1e13 · 1e13); exact ties read
    // as enrichment in b (deterministic)
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val dir = when(d38(col("ca")) * d38(col("__tb")) >
      d38(col("cb")) * d38(col("__ta")), lit("a")).otherwise(lit("b"))
    joined
      .select(col("tok"), col("ca"), col("cb"), dir.as("direction"),
        g2.as("__g2"))
      .orderBy(col("__g2").desc, col("tok")).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("__g2").desc, col("tok"))).cast("long"))
      .select(col("rk"), col("tok"), col("ca"), col("cb"),
        col("direction"))
  }

  /** Vocabulary-growth curve (Heaps' law, "How many more documents
    * until my vocabulary saturates?"): after reading the first N
    * documents in ascending-id order, how many token instances and
    * how many DISTINCT token types have been seen — evaluated at the
    * caller's checkpoint ladder. The corpus-sizing report next to
    * q178's frequency spectrum: a flattening curve says new data buys
    * little new vocabulary; a straight power law says keep crawling.
    *
    * Semantics: doc rank = 1-based position in `idCol` order; a type
    * counts at checkpoint N iff its FIRST-seen doc rank ≤ N (so the
    * curve is exact, not sampled); checkpoints beyond the corpus
    * report the whole corpus. All integer arithmetic — hash-exact.
    *
    * Scale shape: ranks ride the distributed [[PrefixSum]] scan (the
    * q184 rule — no global window); first-seen ranks are one
    * token-keyed min agg (partial+final); each side buckets to its
    * checkpoint with a literal CASE ladder, so the only post-agg
    * state is the ladder-sized frame the running totals run over
    * (model-sized, require-guarded — the waterFill pattern). */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints.forall(_ >= 1),
      s"checkpoints must be >= 1: $checkpoints")
    require(checkpoints == checkpoints.sorted &&
      checkpoints.distinct.size == checkpoints.size,
      s"checkpoints must be strictly ascending: $checkpoints")
    require(checkpoints.size <= 1000,
      s"${checkpoints.size} checkpoints — the ladder frame must stay " +
        "model-sized (the running totals below are unpartitioned)")
    val ranked = PrefixSum.withRunningTotal(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t"),
        lit(1L).as("__one")),
      Seq("__id"), "__one")
    // smallest checkpoint >= rank, as a literal when-chain
    def bucketOf(c: Column): Column =
      checkpoints.foldRight(lit(null).cast("long")) { (cp, acc) =>
        when(c <= cp, lit(cp)).otherwise(acc) }
    val first = ranked.select(col("__one_cum").as("__rk"),
        explode(TextFunctions.tokens(col("__t"))).as("__tok"))
      .groupBy(col("__tok")).agg(min(col("__rk")).as("__fr"))
    val types = first.select(bucketOf(col("__fr")).as("__cp"))
      .filter(col("__cp").isNotNull)
      .groupBy(col("__cp")).agg(count(lit(1)).as("__nt"))
    val toks = ranked.select(bucketOf(col("__one_cum")).as("__cp"),
        TextFunctions.nTokens(col("__t")).as("__ntok"))
      .filter(col("__cp").isNotNull)
      .groupBy(col("__cp"))
      .agg(sum(col("__ntok")).as("__tk"), count(lit(1)).as("__nd"))
    val spark = docs.sparkSession
    import spark.implicits._
    val ladder = checkpoints.toDF("__cp")
    val w = Window.orderBy(col("__cp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ladder
      .join(types, Seq("__cp"), "left")
      .join(toks, Seq("__cp"), "left")
      .select(col("__cp").as("n_docs"),
        sum(coalesce(col("__nd"), lit(0L))).over(w).as("n_docs_seen"),
        sum(coalesce(col("__tk"), lit(0L))).over(w).as("n_tokens"),
        sum(coalesce(col("__nt"), lit(0L))).over(w).as("n_types"))
  }

  /** Top-k BURSTY tokens by Gries' deviation-of-proportions DP
    * (Gries, IJCL 13(4) 2008) across the corpus's parts
    * (sources/shards/snapshots): DP = ½·Σ_p |c_p/C − n_p/N| — 0 when
    * a token spreads exactly like the text mass, →1 when it lives in
    * one part. THE dispersion diagnostic next to raw frequency: a
    * high-count high-DP token is boilerplate from a single source,
    * not general vocabulary — the thing a frequency-ranked stoplist
    * misses.
    *
    * Exactness: DP = A/(2·C·N) with A = Σ_p |c_p·N − n_p·C| — the
    * inner terms are exact DECIMAL(38,0) cross-products (the q190
    * direction trick), and parts where the token is ABSENT contribute
    * C·(N − Σ_{present} n_p) in closed form, so A needs only the
    * token's PRESENT rows, never a dense token×part frame. One double
    * division of two single-conversion operands (scale-0
    * decimal→double, the q197 rule) — DP VALUES gate hash-exact.
    *
    * Scale shape: one (part, token) count agg over the corpus, token
    * totals from that (partial+final), part totals BROADCAST (parts
    * are catalog-sized), per-token agg of the present-part terms,
    * TakeOrdered heap for the cut. minCount is load-bearing: hapax
    * tokens are maximally bursty by definition and would bury the
    * report. */
  def dispersionTopK(docs: DataFrame, partCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val d = (x: Column) => x.cast("double")
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val tp = docs.select(col(partCol).as("__p"),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__p"), col("__tok")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(false) // feeds token totals, part totals, the join
    val parts = tp.groupBy(col("__p")).agg(sum(col("__c")).as("__np"))
    val tot = tp.groupBy(col("__tok").as("__t2"))
      .agg(sum(col("__c")).as("__ct"))
    val nTot = parts.agg(sum(col("__np")).as("__n"))
    val perTok = tp
      .join(broadcast(parts), Seq("__p"))
      .join(tot, col("__tok") === col("__t2"))
      .crossJoin(broadcast(nTot))
      .groupBy(col("__tok"), col("__ct"), col("__n"))
      .agg(sum(abs(d38(col("__c")) * d38(col("__n"))
          - d38(col("__np")) * d38(col("__ct")))).as("__s1"),
        sum(col("__np")).as("__sn"))
    val a = col("__s1") + d38(col("__ct")) *
      (d38(col("__n")) - d38(col("__sn")))
    val dp = d(a) / (lit(2.0) * d(col("__ct")) * d(col("__n")))
    perTok.filter(col("__ct") >= minCount)
      .select(col("__tok").as("tok"), col("__ct").as("c"),
        dp.as("dp"))
      .orderBy(col("dp").desc, col("tok")).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("dp").desc, col("tok"))).cast("long"))
  }

  /** Per-part lexical diversity report: token count, type count,
    * type-token ratio, and Simpson's index D = Σ_i n_i(n_i−1) /
    * (N(N−1)) — the probability two random token instances from the
    * part are the SAME type (higher = more repetitive). The
    * source-quality screen next to [[dispersionTopK]]: a source whose
    * D is far above the corpus norm is template/boilerplate text.
    * Exact integer numerators and denominators summed in
    * DECIMAL(38,0), one conversion each, one division (q197 rule) —
    * ttr and simpson VALUES gate hash-exact. Parts with fewer than
    * two tokens have no token pairs: simpson is null. One (part,
    * token) count agg + one part agg — two shuffles total. */
  def lexicalDiversity(docs: DataFrame, partCol: String,
      textCol: String): DataFrame = {
    val d = (x: Column) => x.cast("double")
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val tp = docs.select(col(partCol).as("part"),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("part"), col("__tok")).agg(count(lit(1)).as("__c"))
    val agg = tp.groupBy(col("part"))
      .agg(sum(col("__c")).as("__nt"), count(lit(1)).as("__tv"),
        sum(d38(col("__c")) * (d38(col("__c")) - lit(1)))
          .as("__pairs"))
    val simpson = when(col("__nt") < 2, lit(null).cast("double"))
      .otherwise(d(col("__pairs")) /
        d(d38(col("__nt")) * (d38(col("__nt")) - lit(1))))
    agg.select(col("part"), col("__nt").as("n_tokens"),
      col("__tv").as("n_types"),
      (d(col("__tv")) / d(col("__nt"))).as("ttr"),
      simpson.as("simpson"))
  }

  /** Vocabulary RICHNESS estimation — "how many distinct types exist
    * in the population this sample came from?": Chao1 (Chao 1984),
    * the lower-bound estimator ecology and corpus linguistics share,
    * plus Good–Turing sample coverage (Good 1953) — the probability
    * mass the NEXT token will be an already-seen type. The planning
    * numbers behind [[vocabGrowth]]'s empirical curve: chao1 says
    * where the curve is heading, coverage says how far along it the
    * sample is.
    *
    * Exactness: N (token instances), D (types), f1 (singletons), f2
    * (doubletons) are exact integers off one type-frequency agg;
    *   chao1 = D + f1²/(2·f2)            (f2 > 0)
    *         = D + f1(f1−1)/2            (f2 = 0, the bias-corrected
    *                                      fallback — exact integers)
    *   coverage = 1 − f1/N
    * are fixed trees of correctly-rounded IEEE ops — hash-exact. An
    * empty group cannot occur (groups exist only with ≥ 1 token).
    *
    * Scale shape: one (grp, token) hash-agg (map-side combined), one
    * agg over the type frame with conditional sums — the
    * [[lexicalDiversity]] shape plus two cells. */
  def vocabRichness(docs: DataFrame, partCol: String,
      textCol: String): DataFrame = {
    val d = (x: Column) => x.cast("double")
    val d38 = (x: Column) => x.cast("decimal(38,0)")
    val tp = docs.select(col(partCol).as("part"),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("part"), col("__tok")).agg(count(lit(1)).as("__c"))
    val agg = tp.groupBy(col("part"))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("f2"))
    agg.select(col("part"), col("n_tokens"), col("n_types"),
      col("f1"), col("f2"),
      when(col("f2") > 0, d(col("n_types")) +
          d(d38(col("f1")) * d38(col("f1"))) /
            (lit(2.0d) * d(col("f2"))))
        .otherwise(d(col("n_types")) +
          d(d38(col("f1")) * (d38(col("f1")) - lit(1))) / lit(2.0d))
        .as("chao1"),
      (lit(1.0d) - d(col("f1")) / d(col("n_tokens"))).as("coverage"))
  }
}
