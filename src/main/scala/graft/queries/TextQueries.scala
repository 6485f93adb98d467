package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operator surface over the `documents` table
  * (north-star ops; the reference has no text processing at all —
  * SURVEY.md §2.2). All scoring arithmetic is written in the exact same
  * operation order as the oracle SQL so doubles stay bit-identical.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q26: tokenization stats — token count, distinct tokens, stopword
    * hits, mean token length. Pure per-row expressions over the scan. */
  val q26_token_stats: Q = (s, d) => {
    val t = col("text")
    Tables.documents(s, d).select(
      col("doc_id"),
      nTokens(t).as("n_tokens"),
      size(array_distinct(tokens(t))).cast("long").as("n_distinct"),
      lexiconHits(t, langLexicons("en")).as("n_stop"),
      ((length(t) - nTokens(t) + lit(1)).cast("double") / nTokens(t))
        .as("avg_token_len"))
  }

  val q26_oracle: String =
    """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(len(list_filter(string_split(text, ' '),
         w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop,
       CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
       FROM documents"""

  /** q27: corpus profile by language — counts and char stats with exact
    * integer sums and bit-stable mean. */
  val q27_lang_profile: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("n_sources"))

  val q27_oracle: String =
    """SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       count(DISTINCT source) AS n_sources
       FROM documents GROUP BY lang"""

  /** q28: quality scoring — stopword ratio, length coverage, lexical
    * diversity combined with fixed weights (identical operation order in
    * the oracle keeps doubles exact). */
  val q28_quality_score: Q = (s, d) => {
    val t = col("text")
    val nTok = nTokens(t)
    val stopRatio = lexiconHits(t, langLexicons("en")).cast("double") / nTok
    val coverage = least(lit(1.0), nTok.cast("double") / 100.0)
    val diversity =
      size(array_distinct(tokens(t))).cast("double") / nTok
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      (lit(0.3) * stopRatio + lit(0.4) * coverage + lit(0.3) * diversity)
        .as("quality"))
  }

  val q28_oracle: String =
    """SELECT doc_id, lang,
       0.3 * (CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
              / len(string_split(text, ' ')))
       + 0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
       + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')))
       AS quality
       FROM documents"""

  /** q29: fingerprint dedup groups — md5 of normalized text, surviving id
    * + copy count per group (the hash-groupBy exact-dedup operator; also
    * closes the reference's unimplemented (source,id) uniqueness, O14). */
  val q29_fingerprint_dedup: Q = (s, d) =>
    Dedup.exactGroups(
        Tables.documents(s, d).withColumn("fp", fingerprint(col("text"))),
        col("fp"), col("doc_id"))
      .select(col("key").as("fp"), col("keeper"), col("n_copies"))

  val q29_oracle: String =
    """SELECT md5(lower(text)) AS fp, min(doc_id) AS keeper,
       count(*) AS n_copies
       FROM documents GROUP BY md5(lower(text))"""

  /** q30: n-gram Jaccard near-dup pairs (inverted-index join, no all-
    * pairs comparison) at threshold 0.1. */
  val q30_jaccard_pairs: Q = (s, d) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "text", "doc_id",
      n = 3, minJaccard = 0.1)

  val q30_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(a.n) AS BIGINT) AS na,
         CAST(any_value(b.n) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) AS jac
       FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING CAST(count(*) AS DOUBLE)
         / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.1"""

  /** q31: MinHash+LSH near-dup pairs at threshold 0.5, exact-Jaccard
    * reranked. The oracle is the exact all-pairs computation: with
    * k=64/bands=32 the LSH candidate set provably (p≈0.9999 per pair)
    * contains every pair at jac ≥ 0.5, so results match exactly while
    * the engine only ever compares bucket-mates. */
  val q31_minhash_lsh_pairs: Q = (s, d) =>
    Dedup.minhashLshPairs(Tables.documents(s, d), "text", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5)

  val q31_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(a.n) AS BIGINT) AS na,
         CAST(any_value(b.n) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) AS jac
       FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING CAST(count(*) AS DOUBLE)
         / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5"""

  /** q106: CROSS-LINGUAL / normalized near-dup pairs — the
    * multilingual-corpus operator NEXT.md queued: minhashLshPairs over
    * a Unicode-folded text key (native FoldText: NFD, strip combining
    * marks, lowercase — DuckDB `lower(strip_accents(x))`). The corpus
    * plants the failure mode: every document gains a twin under
    * id+10M whose text is upper-cased with accented vowels
    * (Á É Í Ó Ú), byte-disjoint from the original at every shingle —
    * RAW minhash scores each twin pair jaccard 0 and finds nothing,
    * the folded key scores them 1.0. Both engines mangle AND fold
    * with their own unicode machinery (Spark translate/upper +
    * FoldText vs DuckDB translate/upper + strip_accents/lower), so
    * the gate also pins that the two fold paths agree byte-for-byte
    * on the whole corpus. Same k=64/bands=32 LSH==exact identity band
    * as q31, so the oracle is the exact all-pairs jaccard over folded
    * shingles. */
  val q106_normalized_neardup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val twins = docs.select((col("doc_id") + 10000000L).as("doc_id"),
      upper(translate(col("text"), "aeiou",
        "áéíóú")).as("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(twins)
      .withColumn("__folded", foldText(col("text")))
    Dedup.minhashLshPairs(corpus, "__folded", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5)
  }

  val q106_oracle: String =
    """WITH base AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 10000000,
           upper(translate(text, 'aeiou',
             'áéíóú'))
         FROM documents),
       folded AS (
         SELECT doc_id, lower(strip_accents(text)) AS text FROM base),
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM folded),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(a.n) AS BIGINT) AS na,
         CAST(any_value(b.n) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) AS jac
       FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING CAST(count(*) AS DOUBLE)
         / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5"""

  /** q145: exact similarity join via PREFIX FILTERING
    * ([[graft.operators.PrefixJoin.ppjoinPairs]]) — the deterministic
    * AllPairs/PPJoin candidate generator: provably identical to the
    * exact all-pairs Jaccard join at EVERY threshold (an inequality on
    * the df-global order, not an LSH coin flip), while the inverted
    * index only holds each set's df-rarest prefix. The corpus plants
    * threshold-straddling pairs: every document gains a twin holding
    * its first ceil-3/4 of tokens — truncation keeps twin shingles a
    * subset of the original's, so jac ≈ |twin|/|orig| lands around
    * 0.7 and the 3/5 rational threshold cuts through the distribution
    * (short docs fall below, long docs pass — the cut is load-bearing,
    * and exact-integer: 5·common >= 3·union in both engines). The
    * oracle is the brute-force all-pairs join. */
  val q145_ppjoin_pairs: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val twins = docs.select((col("doc_id") + 20000000L).as("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, greatest(1, " +
        "cast((3 * size(split(text, ' '))) div 4 as int))), ' ')")
        .as("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(twins)
    graft.operators.PrefixJoin.ppjoinPairs(corpus, "text", "doc_id",
      n = 3, tNum = 3, tDen = 5)
  }

  val q145_oracle: String =
    """WITH base AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 20000000,
           array_to_string((string_split(text, ' '))[1:greatest(1,
             (3 * len(string_split(text, ' '))) // 4)], ' ')
         FROM documents),
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM base),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(a.n) AS BIGINT) AS na,
         CAST(any_value(b.n) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) AS jac
       FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING 5 * count(*) >=
         3 * (any_value(a.n) + any_value(b.n) - count(*))"""

  /** q146: weighted sparse-cosine similarity join
    * ([[graft.operators.SparseSim.countCosinePairs]]) — cosine over
    * n-gram COUNT vectors, the frequency-aware near-dup detector that
    * separates "same shingle set, different repetition" from true
    * copies (set-Jaccard is blind to counts). Everything up to the
    * reported score is exact integer arithmetic: cos >= 9/10 is
    * evaluated as 100·dot² >= 81·na²·nb². The corpus plants
    * threshold-straddling twins — each document re-appends its own
    * first half, perturbing the count vector without adding new
    * support — and the df-cap is BINDING: maxDf=8 versus a corpus
    * gram-df reaching 18 drops 13% of candidate generation at
    * sf0.001. The oracle recomputes the CAPPED semantics (the q95
    * contract): candidate pairs share at least one gram at df <= 8,
    * reranked with FULL postings — so the gate pins cap behavior
    * itself at every SF, and at the gate SF the capped output was
    * additionally measured equal to the uncapped all-pairs join
    * (0 qualifying pairs dropped). */
  val q146_sparse_cosine: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val twins = docs.select((col("doc_id") + 30000000L).as("doc_id"),
      expr("concat(text, ' ', array_join(slice(split(text, ' '), 1, " +
        "greatest(1, cast(size(split(text, ' ')) div 2 as int))), ' '))")
        .as("text"))
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(twins)
    graft.operators.SparseSim.countCosinePairs(corpus, "text", "doc_id",
      n = 3, tNum = 9, tDen = 10, maxDf = 8)
  }

  val q146_oracle: String =
    """WITH base AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 30000000,
           text || ' ' || array_to_string((string_split(text, ' '))[
             1:greatest(1, len(string_split(text, ' ')) // 2)], ' ')
         FROM documents),
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM base),
       g AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
             FROM t, unnest(range(1, len(toks) - 1)) u(i)),
       p AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) cnt
             FROM g GROUP BY doc_id, gram),
       nrm AS (SELECT doc_id, sum(cnt * cnt) n2 FROM p GROUP BY doc_id),
       dfreq AS (SELECT gram, count(*) df FROM p GROUP BY gram),
       cand AS (SELECT DISTINCT a.doc_id ia, b.doc_id ib
               FROM p a JOIN p b
                 ON a.gram = b.gram AND a.doc_id < b.doc_id
               JOIN dfreq f ON f.gram = a.gram
               WHERE f.df <= 8),
       dot AS (SELECT a.doc_id ia, b.doc_id ib, sum(a.cnt * b.cnt) d
               FROM p a JOIN p b
                 ON a.gram = b.gram AND a.doc_id < b.doc_id
               JOIN cand c ON c.ia = a.doc_id AND c.ib = b.doc_id
               GROUP BY a.doc_id, b.doc_id)
       SELECT ia AS id_a, ib AS id_b, CAST(d AS BIGINT) AS dot,
         CAST(na.n2 AS BIGINT) AS na2, CAST(nb.n2 AS BIGINT) AS nb2,
         CAST(d AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
           * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
       FROM dot JOIN nrm na ON na.doc_id = ia
       JOIN nrm nb ON nb.doc_id = ib
       WHERE 100 * d * d >= 81 * na.n2 * nb.n2"""

  /** q147: multi-phrase search through a positional inverted index
    * ([[graft.operators.PhraseSearch.phraseHits]]) — exact-position
    * phrase matching for a whole phrase table in ONE corpus pass
    * (banned-phrase screening / contamination probes), instead of one
    * contains() scan per phrase. The phrase set is derived from the
    * corpus itself so the gate self-calibrates across SFs: every 50th
    * document contributes its tokens 6-8 as a 3-term phrase; matches
    * align candidate starts (position − offset) and require all three
    * offsets to land. The source document always matches its own
    * phrase, and the tiny shared vocabulary makes cross-document hits
    * genuinely common — both engines must agree on every (phrase,
    * doc, hit-count) row. */
  val q147_phrase_search: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val phrases = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("phrase_id"),
        slice(split(col("text"), " "), 6, 3).as("terms"))
      .filter(size(col("terms")) === 3)
    graft.operators.PhraseSearch.phraseHits(docs, "doc_id", "text",
      phrases, "phrase_id", "terms")
  }

  val q147_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
         FROM documents),
       ph AS (SELECT doc_id AS phrase_id,
           array_to_string(toks[6:8], ' ') AS phrase,
           toks[6:8] AS terms
         FROM t WHERE doc_id % 50 = 0 AND len(toks) >= 8),
       pt AS (SELECT phrase_id, phrase, CAST(o AS BIGINT) - 1 AS off,
           terms[CAST(o AS INT)] AS term
         FROM ph, unnest(range(1, 4)) u(o)),
       post AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
           toks[CAST(i AS INT)] AS term
         FROM t, unnest(range(1, len(toks) + 1)) u(i)),
       m AS (SELECT post.doc_id, pt.phrase_id, pt.phrase,
           post.pos - pt.off AS strt, count(*) c
         FROM post JOIN pt ON post.term = pt.term
         WHERE post.pos - pt.off >= 0
         GROUP BY 1, 2, 3, 4)
       SELECT phrase_id, phrase, doc_id,
         CAST(count(*) AS BIGINT) AS n_hits
       FROM m WHERE c = 3 GROUP BY 1, 2, 3"""

  /** q148: BPE pair statistics ([[graft.operators.Bpe.pairStats]]) —
    * one vocabulary-induction round's candidate table: adjacent
    * within-word symbol-pair frequencies, top-20 by (n DESC, x, y).
    * The iterative trainer is a driver loop over this operator; the
    * gate pins the counting + deterministic cut. */
  val q148_bpe_pair_stats: Q = (s, d) =>
    graft.operators.Bpe.pairStats(Tables.documents(s, d), "text", 20)

  val q148_oracle: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) word
         FROM documents),
       c AS (SELECT word, CAST(i AS INT) i
         FROM w, unnest(range(1, length(word))) u(i))
       SELECT word[i] AS x, word[i+1] AS y,
         CAST(count(*) AS BIGINT) AS n
       FROM c GROUP BY x, y ORDER BY n DESC, x, y LIMIT 20"""

  /** The q149 merge table: rank-ordered, drawn from the corpus's own
    * frequent pairs so merges actually fire, with two multi-char
    * chains ((o,r)→(or,t) makes "sort"→"s ort"; (e,r)→(er,g) makes
    * "merge"→"m erg e") that pin rank-order application, not just
    * single-pass substitution. */
  private val bpeMerges = Seq("e" -> "r", "o" -> "r", "s" -> "t",
    "or" -> "t", "er" -> "g", "t" -> "h")

  /** q149: BPE merge-table APPLY ([[graft.operators.Bpe.applyMerges]])
    * — tokenize the corpus with a fixed trained merge table, the
    * NEXT.md "hard to oracle in SQL" candidate, delivered exactly:
    * both engines run the IDENTICAL left-to-right non-overlapping
    * fold per merge rank (Spark `aggregate` with a token-string
    * accumulator; DuckDB `list_reduce` — a just-merged tail is a
    * longer symbol and cannot re-match, so greedy left-to-right falls
    * out of the fold with no island bookkeeping). Zero-shuffle
    * stateless projection; the oracle SQL is generated by unrolling
    * the six merge ranks. */
  val q149_bpe_apply: Q = (s, d) =>
    graft.operators.Bpe.applyMerges(Tables.documents(s, d), "doc_id",
      "text", bpeMerges)

  /** DuckDB SQL for one word's BPE pieces under [[bpeMerges]] —
    * the unrolled list_reduce chain shared by the q149 and q162
    * oracles. */
  private val bpeWordSql: String = {
    var cur = "list_transform(range(1, length(w) + 1), " +
      "i -> w[CAST(i AS INT)])"
    for ((x, y) <- bpeMerges) {
      cur = s"string_split(list_reduce($cur, (acc, t) -> CASE WHEN " +
        s"string_split(acc, ' ')[-1] = '$x' AND t = '$y' THEN " +
        s"array_to_string(string_split(acc, ' ')[:-2] || ['$x$y'], " +
        s"' ') ELSE acc || ' ' || t END), ' ')"
    }
    s"array_to_string($cur, ' ')"
  }

  val q149_oracle: String = {
    val wordSql = bpeWordSql
    s"""WITH b AS (SELECT doc_id,
         array_to_string(list_transform(
           list_filter(string_split(text, ' '), w -> length(w) > 0),
           w -> $wordSql), ' | ') AS bpe,
         len(list_filter(string_split(text, ' '),
           w -> length(w) > 0)) AS nw
       FROM documents)
       SELECT doc_id, bpe,
         CAST(len(string_split(bpe, ' ')) - (nw - 1) AS BIGINT)
           AS n_sym
       FROM b"""
  }

  /** q162: tokenizer fertility by source — the vocabulary-fit report a
    * pipeline owner reads per feed: documents, whitespace words, BPE
    * symbols under the fixed q149 merge table, and fertility
    * (symbols per word — high fertility means the vocabulary splits
    * this feed's words into many pieces, i.e. poor fit / wasted
    * sequence length). Composes [[graft.operators.Bpe.applyMerges]]
    * (zero-shuffle projection) with one doc_id join to recover
    * `source` and one source-keyed agg; the oracle replays the full
    * per-word fold via the shared unrolled merge SQL. */
  val q162_bpe_fertility: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val bpe = graft.operators.Bpe.applyMerges(docs, "doc_id", "text",
      bpeMerges)
    bpe.join(docs.select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "),
          w => length(w) > lit(0))).cast("long").as("nw")),
      Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("n_sym")).as("n_sym"))
      .withColumn("fertility",
        col("n_sym").cast("double") / col("n_words"))
  }

  val q162_oracle: String =
    s"""WITH b AS (SELECT doc_id, source,
         array_to_string(list_transform(
           list_filter(string_split(text, ' '), w -> length(w) > 0),
           w -> $bpeWordSql), ' | ') AS bpe,
         len(list_filter(string_split(text, ' '),
           w -> length(w) > 0)) AS nw
       FROM documents)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS n_words,
         CAST(sum(len(string_split(bpe, ' ')) - (nw - 1)) AS BIGINT)
           AS n_sym,
         CAST(sum(len(string_split(bpe, ' ')) - (nw - 1)) AS DOUBLE)
           / sum(nw) AS fertility
       FROM b GROUP BY source"""

  /** q173: BPE merge-round induction ([[graft.operators.Bpe
    * .trainMerges]]) — the greedy vocabulary TRAINING loop itself,
    * four rounds over the real corpus slice: count weighted adjacent
    * pairs over the word-frequency table, take the (n DESC, x, y)
    * argmax, merge it everywhere, repeat. Output (rank, x, y, n) with
    * n = the pair's frequency at selection time. The oracle unrolls
    * all four rounds in generated SQL (the q161 per-round pattern):
    * each b_r CTE recomputes round r's argmax and each t_r re-applies
    * it via the SAME list_reduce fold q149 pinned — the merge pair is
    * data-dependent, so the fold's CASE references the b_r columns
    * through a cross join rather than literals. Every CTE is
    * MATERIALIZED: t_r is referenced by both p_{r+1} and t_{r+1}, and
    * un-materialized DuckDB CTE re-inlining is exponential in rounds
    * (the q166 lesson). */
  val q173_bpe_train: Q = (s, d) =>
    graft.operators.Bpe.trainMergesDf(Tables.documents(s, d), "text",
      rounds = 4)

  val q173_oracle: String = {
    val rounds = 4
    val mergeT = (r: Int) =>
      s"""t$r AS MATERIALIZED (SELECT word, nw,
           string_split(list_reduce(syms,
             (acc, t) -> CASE WHEN string_split(acc, ' ')[-1] = b.x
                 AND t = b.y
               THEN array_to_string(string_split(acc, ' ')[:-2]
                 || [b.x || b.y], ' ')
               ELSE acc || ' ' || t END), ' ') AS syms
         FROM t${r - 1} CROSS JOIN b$r b)"""
    val steps = (1 to rounds).map { r =>
      val pb =
        s"""p$r AS (SELECT syms[CAST(i AS INT)] AS x,
             syms[CAST(i AS INT) + 1] AS y, sum(nw) AS n
           FROM t${r - 1}, unnest(range(1, len(syms))) u(i)
           GROUP BY 1, 2),
           b$r AS MATERIALIZED (SELECT x, y, CAST(n AS BIGINT) AS n
             FROM p$r ORDER BY n DESC, x, y LIMIT 1)"""
      // the final round's re-tokenization feeds nothing — skip it
      if (r < rounds) pb + ",\n       " + mergeT(r) else pb
    }.mkString(",\n       ")
    val sel = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, x, y, n FROM b$r")
      .mkString("\n       UNION ALL ")
    s"""WITH wq AS MATERIALIZED (SELECT word,
         CAST(count(*) AS BIGINT) AS nw FROM (
           SELECT unnest(string_split(text, ' ')) AS word
           FROM documents)
         WHERE length(word) >= 2 GROUP BY word),
       t0 AS MATERIALIZED (SELECT word, nw,
         list_transform(range(1, length(word) + 1),
           i -> word[CAST(i AS INT)]) AS syms FROM wq),
       $steps
       $sel"""
  }

  /** q178: token frequency spectrum (count-of-counts) — the
    * frequency-of-frequencies table: for each occurrence count f, how
    * many distinct token types occur exactly f times, and the total
    * token mass f·n_types they carry. This is the Good–Turing
    * smoothing input, the Zipf-fit diagnostic, and the
    * vocabulary-sizing report (the long tail of f=1 hapaxes is what a
    * tokenizer budget fights) — a corpus-level number every training
    * run reads once. Scale shape: two hash aggs — tokens (the big
    * one, map-side combined) then the spectrum (cardinality ≤ max
    * frequency, tiny); nothing else. */
  val q178_token_spectrum: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n_types"))
      .select(col("f"), col("n_types"),
        (col("f") * col("n_types")).as("mass"))

  val q178_oracle: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
         FROM documents),
       fr AS (SELECT tok, CAST(count(*) AS BIGINT) AS f
         FROM t WHERE length(tok) > 0 GROUP BY tok)
       SELECT f, CAST(count(*) AS BIGINT) AS n_types,
         CAST(f * count(*) AS BIGINT) AS mass
       FROM fr GROUP BY f"""

  /** q164: exact order-statistic length quantiles per source
    * ([[graft.operators.Privacy.quantileProfile]]) — p25/p50/p75/p90
    * of n_chars as actual row values at ceil(p·n), NOT interpolated
    * percentiles (q49 covers those): order statistics are the
    * engine-portable quantile, selected by identical integer rank
    * arithmetic in both engines. One partitioned window + one agg. */
  val q164_length_quantiles: Q = (s, d) =>
    graft.operators.Privacy.quantileProfile(Tables.documents(s, d),
        "source", "n_chars", "doc_id")
      .select(col("grp").as("source"), col("n"), col("p25"), col("p50"),
        col("p75"), col("p90"))

  val q164_oracle: String =
    """WITH r AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source
           ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
       FROM documents)
       SELECT source, CAST(max(n) AS BIGINT) AS n,
         max(CASE WHEN rn = (1 * n + 3) // 4 THEN v END) AS p25,
         max(CASE WHEN rn = (2 * n + 3) // 4 THEN v END) AS p50,
         max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS p75,
         max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90
       FROM r GROUP BY source"""

  /** q167: count-min heavy hitters ([[graft.operators.Sketch]]) — the
    * top-20 tokens by exact count, each with its 4×512 count-min
    * ESTIMATE. Both columns gate hash-exact: the sketch's md5-derived
    * row hashes make the counter matrix and every collision a pure
    * function of the corpus, so the oracle replays the estimates
    * including their overestimation error — a sketch gate with no
    * tolerance band (contrast q45's HLL, engine-specific by nature).
    * Plan: one d·w-bounded hash-agg for the matrix (broadcast back),
    * one token count agg, probe join. */
  val q167_cms_heavy: Q = (s, d) => {
    val items = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
    val mat = graft.operators.Sketch.countMinMatrix(items, "token",
      d = 4, w = 512)
    val exact = items.groupBy(col("token")).agg(count(lit(1)).as("n"))
    graft.operators.Sketch.countMinEstimates(mat, exact, "token",
        d = 4, w = 512)
      .join(exact, col("key") === col("token"))
      .select(col("token"), col("n"), col("est"))
      .orderBy(col("n").desc, col("token")).limit(20)
  }

  val q167_oracle: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
         FROM documents),
       mat AS (SELECT r,
           CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || t),
             1, 4)) AS INT) % 512 AS bucket, count(*) AS c
         FROM tok CROSS JOIN range(4) rr(r) GROUP BY 1, 2),
       ex AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
       pr AS (SELECT ex.t, ex.n, r,
           CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || ex.t),
             1, 4)) AS INT) % 512 AS bucket
         FROM ex CROSS JOIN range(4) rr(r)),
       est AS (SELECT pr.t, pr.n, min(COALESCE(mat.c, 0)) AS est
         FROM pr LEFT JOIN mat ON mat.r = pr.r AND mat.bucket = pr.bucket
         GROUP BY pr.t, pr.n)
       SELECT t AS token, CAST(n AS BIGINT) AS n, CAST(est AS BIGINT) AS est
       FROM est ORDER BY n DESC, token LIMIT 20"""

  /** q168: count-min MERGEABILITY ([[graft.operators.Sketch
    * .mergeMatrices]]) — the property that makes the sketch
    * distributed: the corpus splits by doc_id parity, each half
    * sketches INDEPENDENTLY, the merged matrix serves the same top-20
    * estimates as q167, and the oracle recomputes from the FULL corpus
    * — so the gate passes only because cell-wise sums commute with
    * corpus union exactly. This is the per-shard / per-day sketch
    * workflow: union summaries, never re-read data. */
  val q168_cms_merged: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def half(p: Int) = docs.filter(col("doc_id") % 2 === p)
      .select(explode(split(col("text"), " ")).as("token"))
    val merged = graft.operators.Sketch.mergeMatrices(Seq(
      graft.operators.Sketch.countMinMatrix(half(0), "token", 4, 512),
      graft.operators.Sketch.countMinMatrix(half(1), "token", 4, 512)))
    val items = docs.select(explode(split(col("text"), " ")).as("token"))
    val exact = items.groupBy(col("token")).agg(count(lit(1)).as("n"))
    graft.operators.Sketch.countMinEstimates(merged, exact, "token",
        d = 4, w = 512)
      .join(exact, col("key") === col("token"))
      .select(col("token"), col("n"), col("est"))
      .orderBy(col("n").desc, col("token")).limit(20)
  }

  /** q170: robust length-outlier census per source
    * ([[graft.operators.Curation.robustOutliers]]) — median/MAD
    * outlier detection over n_chars at k=3 (9 corpus-wide outliers at
    * gate SF, so the flag is load-bearing): the truncation/
    * concatenation-anomaly detector that mean/stddev z-scores get
    * dragged off by. Both med and MAD are exact order statistics (the
    * q164 selection rule), deviations and flags are integer
    * arithmetic — the census gates with no tolerance. */
  val q170_robust_outliers: Q = (s, d) =>
    graft.operators.Curation.robustOutliers(Tables.documents(s, d),
        "source", "n_chars", "doc_id", k = 3)
      .select(col("grp").as("source"), col("n"), col("med"),
        col("mad"), col("n_out"))

  val q170_oracle: String =
    """WITH r AS (SELECT source, CAST(n_chars AS BIGINT) AS v, doc_id,
         row_number() OVER (PARTITION BY source
           ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
       FROM documents),
       med AS (SELECT source, max(n) AS n,
           max(CASE WHEN rn = (2 * n + 3) // 4 THEN v END) AS med
         FROM r GROUP BY source),
       d AS (SELECT r.source, abs(r.v - med.med) AS dev, r.doc_id
         FROM r JOIN med USING (source)),
       r2 AS (SELECT source, dev,
           row_number() OVER (PARTITION BY source
             ORDER BY dev, doc_id) AS rn2,
           count(*) OVER (PARTITION BY source) AS n2
         FROM d),
       mad AS (SELECT source,
           max(CASE WHEN rn2 = (2 * n2 + 3) // 4 THEN dev END) AS mad
         FROM r2 GROUP BY source)
       SELECT med.source, CAST(med.n AS BIGINT) AS n,
         CAST(med.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
         CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
           AS BIGINT) AS n_out
       FROM d JOIN med USING (source) JOIN mad USING (source)
       GROUP BY med.source, med.n, med.med, mad.mad"""

  /** q171: dedup impact by source — the "which feed is redundant"
    * report a corpus owner reads before paying for more of it: per
    * source, document count, exact-duplicate members (text appears
    * more than once corpus-wide) and near-duplicate members (flagged
    * id_b of a minhash pair at 0.5 — q32's operator and parameters,
    * whose LSH==all-pairs identity this corpus preserves: planted
    * twins have bit-identical signatures and twin-of-A pairs collide
    * exactly when A's pairs do). Corpus = documents ∪ every-7th doc
    * re-id'd (same text, same source), so both columns are
    * load-bearing. */
  val q171_dedup_by_source: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val corpus = docs.select(col("doc_id"), col("text"), col("source"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 40000000L).as("doc_id"), col("text"),
          col("source")))
    val exactN = corpus.groupBy(col("text")).agg(count(lit(1)).as("__n"))
    val nearIds = Dedup.minhashLshPairs(corpus, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("__nd", lit(1L))
    corpus.join(exactN, Seq("text"))
      .join(nearIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("__nd").isNotNull, 1L).otherwise(0L))
          .as("n_near_dup"))
  }

  val q171_oracle: String =
    """WITH c AS (SELECT doc_id, text, source FROM documents
         UNION ALL SELECT doc_id + 40000000, text, source
         FROM documents WHERE doc_id % 7 = 0),
       eg AS (SELECT text, count(*) AS n FROM c GROUP BY text),
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM c),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh),
       dup AS (
         SELECT DISTINCT b.doc_id AS doc_id
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         HAVING CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5)
       SELECT c.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN eg.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_dup,
         CAST(sum(CASE WHEN c.doc_id IN (SELECT doc_id FROM dup)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
       FROM c JOIN eg USING (text) GROUP BY c.source"""

  /** q172: cross-source quantile normalization
    * ([[graft.operators.Curation.quantileNormalize]]) — every
    * source's n_chars distribution mapped onto the global one (the
    * r-th of a source's n_g docs takes the value of the
    * ceil(r·N/n_g)-th doc corpus-wide): the score-calibration step
    * before one corpus-wide threshold can govern heterogeneous feeds.
    * Exact end-to-end — ranks, index arithmetic, and substituted
    * values are all integers; the Spark global rank is the PrefixSum
    * distributed scan while the oracle uses a plain global window. */
  val q172_quantile_normalize: Q = (s, d) =>
    graft.operators.Curation.quantileNormalize(Tables.documents(s, d),
        "source", "n_chars", "doc_id")
      .select(col("tb").as("doc_id"), col("grp").as("source"),
        col("v").as("n_chars"), col("rank_grp"), col("norm"))

  val q172_oracle: String =
    """WITH b AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v
         FROM documents),
       g AS (SELECT v, row_number() OVER (ORDER BY v, doc_id) AS gr
         FROM b),
       n AS (SELECT count(*) AS nn FROM b),
       r AS (SELECT doc_id, source, v,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY v, doc_id) AS BIGINT) AS rank_grp,
           count(*) OVER (PARTITION BY source) AS ng
         FROM b)
       SELECT r.doc_id, r.source, r.v AS n_chars, r.rank_grp,
         CAST(g.v AS BIGINT) AS norm
       FROM r JOIN n ON TRUE
       JOIN g ON g.gr = (r.rank_grp * n.nn + r.ng - 1) // r.ng"""

  /** q108: URL-canonicalization dedup — the crawled-web dedup key the
    * r09 verdict queued (fixtures have no url column, so the corpus is
    * synthesized from doc_id the way every multimodal gate builds its
    * payloads). Each document contributes THREE byte-distinct aliases
    * of one logical URL: the canonical form itself, a mangled twin
    * (upper-case scheme+host, explicit :443, a "." path segment,
    * re-ordered params, an utm_ tracking param, a fragment), and a
    * second twin (trailing host dot, duplicate slash + ".." segment,
    * %61-encoded path letter, lowercase %2f hex in a param value, a
    * gclid param). canonicalizeUrl must undo every mangle — host case,
    * default port, dot segments, percent-encoding, param order,
    * tracking params, fragment — for the three aliases to share one
    * exactGroups key; the DuckDB oracle recomputes the canonical
    * string and the 3-member group in closed form from doc_id, so any
    * canonicalizer defect splits a group and hash-fails the gate.
    * Scale shape: per-row expression + one count/min hash-agg — the
    * exact-dedup plan, nothing new rides the shuffle. */
  val q108_url_canon_dedup: Q = (s, d) => {
    val base = Tables.documents(s, d).select(col("doc_id"),
      (col("doc_id") % 37).as("k"),
      (col("doc_id") % 7).as("a"),
      (col("doc_id") % 3).as("b"))
    val v0 = base.select(col("doc_id"), concat(
      lit("https://site"), col("k"), lit(".example.org/docs/page"),
      col("doc_id"), lit("?a="), col("a"), lit("&b="), col("b"),
      lit("&c=x%2Fy")).as("url"))
    val v1 = base.select((col("doc_id") + 20000000L).as("doc_id"), concat(
      lit("HTTPS://SITE"), col("k"), lit(".EXAMPLE.ORG:443/docs/./page"),
      col("doc_id"), lit("?b="), col("b"),
      lit("&utm_source=feed&c=x%2Fy&a="), col("a"),
      lit("#sec"), col("doc_id")).as("url"))
    val v2 = base.select((col("doc_id") + 30000000L).as("doc_id"), concat(
      lit("https://site"), col("k"),
      lit(".example.org./docs//extra/../p%61ge"), col("doc_id"),
      lit("?a="), col("a"), lit("&c=x%2fy&b="), col("b"),
      lit("&gclid=g"), col("doc_id")).as("url"))
    val urls = v0.unionByName(v1).unionByName(v2)
    Dedup.exactGroups(urls, canonicalizeUrl(col("url")), col("doc_id"))
      .select(col("key").as("url"), col("keeper").as("min_id"),
        col("n_copies").as("n_members"))
  }

  val q108_oracle: String =
    """SELECT 'https://site' || (doc_id % 37) || '.example.org/docs/page'
         || doc_id || '?a=' || (doc_id % 7) || '&b=' || (doc_id % 3)
         || '&c=x%2Fy' AS url,
       doc_id AS min_id, CAST(3 AS BIGINT) AS n_members
       FROM documents"""

  /** q109: HTML → text extraction — crawl-ingestion step 0, gated the
    * multimodal way: the corpus synthesizes a full page around each
    * fixture text in closed form (doctype, comment carrying the id,
    * title, a style block with a `>` in its selector, a script block
    * with a bare `<` in its code, one `<p>` per token, and a div of
    * entity-encoded text covering named/decimal/hex forms), and
    * stripHtml must recover the expected text BYTE-EXACTLY: title and
    * heading content stays, script/style content and every tag
    * disappears, `&lt;raw&gt;` comes back as literal `<raw>` (decode
    * runs after tag-strip), `&#65;&#x42;` decodes to `AB`, and the
    * injected `</p>\n<p>` per-token markup collapses back to the
    * original single spacing. The DuckDB oracle writes the expected
    * extraction as pure string concatenation from doc_id + text.
    * Scale shape: one per-row expression inside the scan — no
    * shuffle, no join; the 100 TB cost is the regex passes, linear in
    * page bytes. */
  val q109_html_extract: Q = (s, d) => {
    val page = concat(
      lit("<!DOCTYPE html><html><!-- id "), col("doc_id"),
      lit(" --><head><title>Doc "), col("doc_id"),
      lit("</title><STYLE media=\"all\">p > span { color: #aaa; }"
        + "</STYLE><script type=\"text/javascript\">if (1 < 2) "
        + "alert(\"x\");</script></head><body>\n  <h1 class=\"t\">Doc "),
      col("doc_id"), lit("</h1>\n  <p>"),
      regexp_replace(col("text"), " ", "</p>\n<p>"),
      lit("</p>\n  <div>&amp;&nbsp;&lt;raw&gt;&#65;&#x42;</div>"
        + "</body></html>"))
    Tables.documents(s, d)
      .select(col("doc_id"), stripHtml(page).as("extracted"))
  }

  val q109_oracle: String =
    """SELECT doc_id,
       'Doc ' || doc_id || ' Doc ' || doc_id || ' ' || text
         || ' & <raw>AB' AS extracted
       FROM documents"""

  /** q111: C4-style line-level boilerplate filtering (arXiv:1910.10683
    * §2.2) — each doc becomes a five-line "page": its real text, an
    * enable-javascript line, a cookie-consent line (both blocklisted,
    * one only via case-fold), a 2-word stub (under the 4-word floor),
    * and a closing prose line carrying the doc id. cleanLines must
    * keep exactly the prose: the original text (unless the doc itself
    * has < 4 words — the rule is applied honestly, and the oracle's
    * CASE mirrors it) and the closing line, re-joined with the
    * original newline. Per-row builtin composition — no shuffle. */
  val q111_clean_lines: Q = (s, d) => {
    val closing = concat(lit("doc "), col("doc_id"),
      lit(" closing remarks with plenty of words here"))
    val page = concat_ws("\n", col("text"),
      lit("please enable JavaScript to continue viewing"),
      lit("We use Cookies accept our policy"),
      lit("read more"), closing)
    Tables.documents(s, d).select(col("doc_id"),
      cleanLines(page, minWords = 4,
        blocklist = Seq("javascript", "cookie")).as("cleaned"))
  }

  val q111_oracle: String =
    """SELECT doc_id,
       CASE WHEN len(string_split(text, ' ')) >= 4
         THEN text || chr(10) || 'doc ' || doc_id
           || ' closing remarks with plenty of words here'
         ELSE 'doc ' || doc_id
           || ' closing remarks with plenty of words here' END AS cleaned
       FROM documents"""

  /** q114: per-domain diversity cap (Gopher's "at most N per domain"
    * corpus rule) — hosts come from the builtin parse_url over the
    * q108-style synthetic URL column, the cap keeps the 3 lowest
    * doc_ids per host (id appended to the order → total order, engine
    * portable). One row_number window; WindowGroupLimit prunes rank >
    * cap before the per-key sort, so a mega-domain costs its scan, not
    * a full sort. The oracle recomputes host and rank closed-form. */
  val q114_domain_cap: Q = (s, d) => {
    val urls = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("https://site"), col("doc_id") % 37,
        lit(".example.org/docs/page"), col("doc_id")).as("url"))
    val hosted = urls.withColumn("host", parse_url(col("url"), lit("HOST")))
    graft.operators.Sample.capPerKey(hosted, col("host"),
        Seq(col("doc_id")), cap = 3)
      .select(col("doc_id"), col("host"))
  }

  val q114_oracle: String =
    """SELECT doc_id, 'site' || (doc_id % 37) || '.example.org' AS host
       FROM (SELECT doc_id, row_number() OVER
               (PARTITION BY doc_id % 37 ORDER BY doc_id) AS rn
             FROM documents)
       WHERE rn <= 3"""

  /** q122: winnowing fingerprints (MOSS) — each doc's rightmost-min
    * gram hashes over w=5 windows of k=4-token grams, exploded to
    * (doc_id, pos, fp). The oracle replays gram construction, the
    * 52-bit md5 hash (q34's convention), and the rightmost-min
    * selection with list ops, windowing a short-doc tail as a single
    * window exactly like the expression. ~8.5k fingerprints from
    * ~23.5k grams at sf0.001 — the ~2/(w+1) density the paper
    * guarantees. Per-row expression + explode: no shuffle. */
  val q122_winnow_fingerprints: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(winnowFingerprints(col("text"), k = 4, w = 5)).as("f"))
      .select(col("doc_id"), col("f.pos").cast("long").as("pos"),
        col("f.fp").as("fp"))

  val q122_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         FROM documents),
       g AS (SELECT doc_id, list_transform(
               range(1, greatest(len(toks) - 3, 0) + 1),
               i -> array_to_string(list_slice(toks, i, i + 3), ' '))
               AS grams
             FROM t),
       h AS (SELECT doc_id, list_transform(grams,
               s -> CAST(('0x' || substr(md5(s), 1, 13)) AS BIGINT)) AS hs
             FROM g WHERE len(grams) >= 1),
       sel AS (SELECT doc_id, list_transform(
               range(1, greatest(len(hs) - 5, 0) + 2),
               j -> {'pos': j
                       + len(list_slice(hs, j, least(j + 4, len(hs))))
                       - list_position(list_reverse(
                           list_slice(hs, j, least(j + 4, len(hs)))),
                         list_min(list_slice(hs, j, least(j + 4, len(hs)))))
                       - 1,
                     'fp': list_min(list_slice(hs, j, least(j + 4, len(hs))))
                    }) AS fps
             FROM h)
       SELECT DISTINCT doc_id, CAST(u.f['pos'] AS BIGINT) AS pos,
         CAST(u.f['fp'] AS BIGINT) AS fp
       FROM sel, unnest(fps) u(f)"""

  /** q117: corpus-wide paragraph-level exact dedup (C4's span rule,
    * paragraph-aligned — ParagraphDedup.dedupeParagraphs scaladoc has
    * the scale argument for why keeper selection is an agg-min + skew
    * join, not a window). Pages carry a per-residue banner (dup across
    * ~71 docs each), the doc's own text, a corpus-wide footer (dup
    * across all docs), and a unique closing line; only the globally
    * FIRST (doc_id, pos) occurrence of each paragraph survives and
    * docs reassemble in original order. The oracle recomputes keeper
    * selection with a window over the same synthesized split —
    * 992 paragraphs drop at sf0.001 (493 banners + 499 footers). */
  val q117_paragraph_dedup: Q = (s, d) => {
    val page = concat_ws("\n",
      concat(lit("banner "), col("doc_id") % 7),
      col("text"),
      lit("footer navigation links contact"),
      concat(lit("doc "), col("doc_id"), lit(" closing")))
    graft.operators.ParagraphDedup.dedupeParagraphs(
      Tables.documents(s, d).select(col("doc_id"), page.as("page")),
      "doc_id", "page")
  }

  val q117_oracle: String =
    """WITH t AS (SELECT doc_id,
         string_split('banner ' || (doc_id % 7) || chr(10) || text
           || chr(10) || 'footer navigation links contact' || chr(10)
           || 'doc ' || doc_id || ' closing', chr(10)) AS a
       FROM documents),
       paras AS (SELECT doc_id, i - 1 AS pos, a[CAST(i AS INT)] AS para
         FROM t, unnest(range(1, len(a) + 1)) u(i)),
       k AS (SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
         FROM paras)
       SELECT doc_id,
         string_agg(CASE WHEN rn = 1 THEN para END, chr(10) ORDER BY pos)
           AS cleaned,
         CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
       FROM k GROUP BY doc_id"""

  /** q126: INCREMENTAL paragraph dedup — q117's C4 span rule at the
    * delta-vs-lake boundary (ParagraphDedup.incrementalDedupeParagraphs
    * scaladoc has the lake contract): batch = docs with doc_id % 10
    * == 0, corpus = the other 90%. Batch banners and footers all die
    * (the corpus owns every banner residue and the shared footer);
    * each batch doc's unique closing line survives; intra-batch
    * keep-first applies only to paragraphs the corpus does NOT have.
    * The oracle recomputes both membership and the batch-local keeper
    * window from the same synthesized split. Scale shape: the corpus
    * side is scan → broadcast-semi-join → partial-distinct, never a
    * corpus-wide shuffle (PlanSpec pins it). */
  val q126_incr_paragraph_dedup: Q = (s, d) => {
    val page = concat_ws("\n",
      concat(lit("banner "), col("doc_id") % 7),
      col("text"),
      lit("footer navigation links contact"),
      concat(lit("doc "), col("doc_id"), lit(" closing")))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), page.as("page"))
    graft.operators.ParagraphDedup.incrementalDedupeParagraphs(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "page")
  }

  val q126_incr_paragraph_oracle: String =
    """WITH t AS (SELECT doc_id,
         string_split('banner ' || (doc_id % 7) || chr(10) || text
           || chr(10) || 'footer navigation links contact' || chr(10)
           || 'doc ' || doc_id || ' closing', chr(10)) AS a
       FROM documents),
       paras AS (SELECT doc_id, i - 1 AS pos, a[CAST(i AS INT)] AS para
         FROM t, unnest(range(1, len(a) + 1)) u(i)),
       corpus AS (SELECT DISTINCT para FROM paras WHERE doc_id % 10 <> 0),
       bp AS (SELECT * FROM paras WHERE doc_id % 10 = 0),
       k AS (SELECT bp.doc_id, bp.pos, bp.para,
         (corpus.para IS NOT NULL) AS in_corpus,
         row_number() OVER (PARTITION BY bp.para
           ORDER BY bp.doc_id, bp.pos) AS rn
         FROM bp LEFT JOIN corpus ON bp.para = corpus.para)
       SELECT doc_id,
         COALESCE(string_agg(CASE WHEN NOT in_corpus AND rn = 1
             THEN para END, chr(10) ORDER BY pos), '') AS cleaned,
         CAST(count(*) FILTER (WHERE in_corpus OR rn > 1) AS BIGINT)
           AS n_dropped
       FROM k GROUP BY doc_id"""

  /** q137: LARGE-delta incremental paragraph dedup — q126's semantics
    * through the bloom path (incrementalDedupeParagraphsLarge
    * scaladoc): distributed bloom build, codegen probe in the corpus
    * scan, exact shuffled confirm. fpp = 0.3 guarantees false
    * positives fire corpus-wide and must die in the confirm — the
    * gate runs under q126's OWN oracle, so any survivor of a false
    * positive (or loss to one) breaks the hash. */
  val q137_incr_paragraph_large: Q = (s, d) => {
    val page = concat_ws("\n",
      concat(lit("banner "), col("doc_id") % 7),
      col("text"),
      lit("footer navigation links contact"),
      concat(lit("doc "), col("doc_id"), lit(" closing")))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), page.as("page"))
    graft.operators.ParagraphDedup.incrementalDedupeParagraphsLarge(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "page", expectedKeys = 300L, fpp = 0.3)
  }

  /** q113: outlink extraction + canonicalization — the link-graph
    * construction step. Each synthesized page carries three `<a>`
    * links exercising the attribute grammar (uppercase tag with a
    * double-quoted absolute URL, single-quoted mangled URL that only
    * canonicalization collapses, unquoted relative href terminated by
    * a following attribute) plus an `<area href>` decoy the `<a\b>`
    * word boundary must reject. Emits (doc_id, pos, link) with
    * document-order positions pinned; the oracle writes all three
    * expected canonical links per doc in closed form. Scale shape:
    * per-row extract + posexplode + per-row canonicalize — ~3×
    * row-count stream, no shuffle at all. */
  val q113_extract_links: Q = (s, d) => {
    val id = col("doc_id")
    val page = concat(
      lit("<html><body><p>intro text</p><A HREF=\"https://hub"),
      (id + 1) % 37, lit(".example.org/a"), id,
      lit("\">one</A><a class=\"x\" href='HTTPS://HUB"), (id + 2) % 37,
      lit(".EXAMPLE.ORG:443/b"), id, lit("?utm_source=z&m="), id % 5,
      lit("'>two</a><area href=\"decoy\"><a href=/rel/c"), id,
      lit(" rel=nofollow>three</a></body></html>"))
    Tables.documents(s, d)
      .select(id, posexplode(extractLinks(page)).as(Seq("pos", "raw")))
      .select(id, col("pos").cast("long").as("pos"),
        canonicalizeUrl(col("raw")).as("link"))
  }

  val q113_oracle: String =
    """SELECT doc_id, CAST(0 AS BIGINT) AS pos,
         'https://hub' || ((doc_id + 1) % 37) || '.example.org/a'
           || doc_id AS link FROM documents
       UNION ALL
       SELECT doc_id, CAST(1 AS BIGINT),
         'https://hub' || ((doc_id + 2) % 37) || '.example.org/b'
           || doc_id || '?m=' || (doc_id % 5) FROM documents
       UNION ALL
       SELECT doc_id, CAST(2 AS BIGINT), '/rel/c' || doc_id
       FROM documents"""

  /** q110: hashed linear classifier scoring (fastText-style,
    * arXiv:1607.01759) — the model-based quality-filter pass
    * (Classifier.scoreHashedLinear). The gate's "trained model" is a
    * 256-bucket × 4-class INTEGER weight table synthesized in closed
    * form from the bucket id (w_c(b) = (b·2654435761 + c·40503) mod
    * 1997 − 998), so the DuckDB oracle recomputes the entire scoring
    * pass — md5 feature buckets, exact long score sums, greatest-based
    * argmax with lowest-class tie-break — from first principles. Any
    * defect in hashing, the bag semantics (instances, not distinct),
    * the broadcast join, or the tie policy shifts a score or label and
    * hash-fails. Scale shape: explode ≈2×tokens instances → broadcast
    * B-row join → one doc_id groupBy with map-side partial agg. */
  val q110_classifier_label: Q = (s, d) => {
    val B = 256; val C = 4
    val weights = s.range(0, B).select(col("id").cast("int").as("bucket"),
      array((0 until C).map(c =>
        (col("id") * 2654435761L + lit(c.toLong * 40503L)) % 1997L
          - 998L): _*).as("w"))
    graft.operators.Classifier.scoreHashedLinear(
      Tables.documents(s, d), "doc_id", "text", weights, C, B)
  }

  val q110_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') a FROM documents),
       uni AS (SELECT doc_id, unnest(a) gram FROM t),
       bi AS (SELECT doc_id, array_to_string(a[i:i+1], ' ') gram
         FROM t, unnest(range(1, len(a))) u(i)),
       f AS (SELECT doc_id, gram FROM uni
             UNION ALL SELECT doc_id, gram FROM bi),
       bk AS (SELECT doc_id,
           CAST(('0x' || substr(md5(gram), 1, 4)) AS INT) % 256 AS bucket
         FROM f),
       sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_feats,
           CAST(sum((bucket*2654435761 + 0) % 1997 - 998) AS BIGINT) s0,
           CAST(sum((bucket*2654435761 + 40503) % 1997 - 998) AS BIGINT) s1,
           CAST(sum((bucket*2654435761 + 81006) % 1997 - 998) AS BIGINT) s2,
           CAST(sum((bucket*2654435761 + 121509) % 1997 - 998) AS BIGINT) s3
         FROM bk GROUP BY doc_id)
       SELECT doc_id, n_feats, s0, s1, s2, s3,
         CAST(CASE WHEN s0 = g THEN 0 WHEN s1 = g THEN 1
              WHEN s2 = g THEN 2 ELSE 3 END AS BIGINT) AS label
       FROM (SELECT *, greatest(s0, s1, s2, s3) g FROM sc)"""

  /** q151: classifier threshold calibration
    * ([[graft.operators.Classifier.thresholdSweep]]) — the step that
    * turns q110's scores into a deployable filter: sweep candidate
    * cutoffs over the s1−s0 margin against a gold label (lang = 'en'
    * here; any labeled eval slice in production) and report exact
    * confusion counts + precision/recall per cutoff. Candidate
    * thresholds are data-derived (the distinct margins of every 25th
    * document — a calibration sample), so the sweep self-calibrates
    * across SFs; the threshold table broadcasts and the corpus is
    * read once. */
  val q151_threshold_sweep: Q = (s, d) => {
    val B = 256; val C = 4
    val weights = s.range(0, B).select(col("id").cast("int").as("bucket"),
      array((0 until C).map(c =>
        (col("id") * 2654435761L + lit(c.toLong * 40503L)) % 1997L
          - 998L): _*).as("w"))
    val docs = Tables.documents(s, d)
    val scored = graft.operators.Classifier.scoreHashedLinear(
        docs, "doc_id", "text", weights, C, B)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("margin", col("s1") - col("s0"))
      .withColumn("gold", col("lang") === "en")
    val thr = scored.filter(col("doc_id") % 25 === 0)
      .select(col("margin").as("thr"))
    graft.operators.Classifier.thresholdSweep(scored, "margin",
      "gold", thr)
  }

  val q151_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') a
         FROM documents),
       uni AS (SELECT doc_id, unnest(a) gram FROM t),
       bi AS (SELECT doc_id, array_to_string(a[i:i+1], ' ') gram
         FROM t, unnest(range(1, len(a))) u(i)),
       f AS (SELECT doc_id, gram FROM uni
             UNION ALL SELECT doc_id, gram FROM bi),
       bk AS (SELECT doc_id,
           CAST(('0x' || substr(md5(gram), 1, 4)) AS INT) % 256 AS bucket
         FROM f),
       sc AS (SELECT doc_id,
           CAST(sum((bucket*2654435761 + 40503) % 1997 - 998)
             - sum((bucket*2654435761 + 0) % 1997 - 998) AS BIGINT)
             AS margin
         FROM bk GROUP BY doc_id),
       m AS (SELECT sc.doc_id, sc.margin, d.lang = 'en' AS gold
         FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
       thr AS (SELECT DISTINCT margin AS thr FROM m
         WHERE doc_id % 25 = 0)
       SELECT thr,
         CAST(sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0 END)
           AS BIGINT) AS tp,
         CAST(sum(CASE WHEN margin >= thr AND NOT gold THEN 1 ELSE 0
           END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN margin < thr AND gold THEN 1 ELSE 0 END)
           AS BIGINT) AS fn,
         CAST(sum(CASE WHEN margin < thr AND NOT gold THEN 1 ELSE 0
           END) AS BIGINT) AS tn,
         CASE WHEN sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0
             END) + sum(CASE WHEN margin >= thr AND NOT gold THEN 1
             ELSE 0 END) > 0 THEN
           CAST(sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0
             END) AS DOUBLE)
           / (sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0 END)
              + sum(CASE WHEN margin >= thr AND NOT gold THEN 1 ELSE 0
                END)) END AS precision,
         CASE WHEN sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0
             END) + sum(CASE WHEN margin < thr AND gold THEN 1 ELSE 0
             END) > 0 THEN
           CAST(sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0
             END) AS DOUBLE)
           / (sum(CASE WHEN margin >= thr AND gold THEN 1 ELSE 0 END)
              + sum(CASE WHEN margin < thr AND gold THEN 1 ELSE 0
                END)) END AS recall
       FROM m CROSS JOIN thr GROUP BY thr"""

  /** q155: corpus novelty profile
    * ([[graft.operators.Repetition.noveltyProfile]]) — per document,
    * the fraction of its distinct 3-gram shingles first seen in THIS
    * document (minimum doc_id over the append order): the corpus-
    * redundancy diagnostic between the within-doc repetition signals
    * (q97/q130, which never cross documents) and the thresholded dedup
    * joins (which only see pairs). One gram-keyed min agg + join back,
    * no self-join, no pair materialization. */
  val q155_novelty_profile: Q = (s, d) =>
    graft.operators.Repetition.noveltyProfile(Tables.documents(s, d),
      "doc_id", "text", n = 3)

  val q155_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
         FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
       fs AS (SELECT s, min(doc_id) AS first_id FROM ex GROUP BY s)
       SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN fs.first_id = ex.doc_id THEN 1 ELSE 0 END)
           AS BIGINT) AS n_novel,
         CAST(sum(CASE WHEN fs.first_id = ex.doc_id THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*) AS novelty
       FROM ex JOIN fs ON fs.s = ex.s GROUP BY ex.doc_id"""

  /** q157: token co-occurrence mining
    * ([[graft.operators.Assoc.tokenPairSupport]]) — top-50 token
    * pairs by document support (both in the same doc, counted once),
    * the market-basket view that seeds stop-pair lists and query
    * expansion. Per-doc distinct self-join (cost is a document
    * property), one (x, y) hash agg, TakeOrdered heap with the
    * (n DESC, x, y) deterministic cut. */
  val q157_token_pairs: Q = (s, d) =>
    graft.operators.Assoc.tokenPairSupport(Tables.documents(s, d),
      "doc_id", "text", minSupport = 2L, k = 50)

  val q157_oracle: String =
    """WITH t AS (SELECT doc_id,
         list_distinct(string_split(text, ' ')) toks FROM documents),
       e AS (SELECT doc_id, unnest(toks) tk FROM t)
       SELECT a.tk AS x, b.tk AS y, CAST(count(*) AS BIGINT) AS n
       FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.tk < b.tk
       GROUP BY a.tk, b.tk HAVING count(*) >= 2
       ORDER BY n DESC, x, y LIMIT 50"""

  /** q158: source overlap matrix
    * ([[graft.operators.Assoc.sourceOverlap]]) — pairwise shared
    * distinct 3-gram shingles between SOURCES with set Jaccard: the
    * "how much of feed B is already in feed A" report a corpus buyer
    * reads. The corpus collapses to source-level shingle sets in one
    * distinct agg; the join's per-shingle cost is bounded by the
    * catalog-sized source count. */
  val q158_source_overlap: Q = (s, d) =>
    graft.operators.Assoc.sourceOverlap(Tables.documents(s, d),
      "source", "text", n = 3)

  val q158_oracle: String =
    """WITH t AS (SELECT source, string_split(text, ' ') toks
         FROM documents),
       sh AS (SELECT DISTINCT source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' ')))) s FROM t),
       sz AS (SELECT source, count(*) AS nsh FROM sh GROUP BY source)
       SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(za.nsh) AS BIGINT) AS na,
         CAST(any_value(zb.nsh) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(za.nsh) + any_value(zb.nsh) - count(*)) AS jac
       FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
       JOIN sz za ON za.source = a.source
       JOIN sz zb ON zb.source = b.source
       GROUP BY a.source, b.source"""

  /** q32: dedup survivors — documents minus near-duplicates (minhash
    * pairs at 0.5; the higher doc_id of each pair is dropped), the
    * end-to-end "clean the corpus" operator. */
  val q32_dedup_survivors: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dupIds = Dedup.minhashLshPairs(docs, "text", "doc_id",
        n = 3, k = 64, bands = 32, minJaccard = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    docs.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val q32_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh),
       dup AS (
         SELECT DISTINCT b.doc_id AS doc_id
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         HAVING CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5)
       SELECT doc_id, lang, source, n_chars FROM documents
       WHERE doc_id NOT IN (SELECT doc_id FROM dup)"""

  /** q33: SimHash near-dup pairs (hamming ≤ 3 over 64-bit signatures,
    * pigeonhole-banded join). Oracle-exact since round 4: the per-token
    * hash is md5-derived (= DuckDB's md5_number_lower), so the oracle
    * recomputes the signatures bit-for-bit and checks every pair by
    * brute force — the banded join must find exactly the all-pairs
    * result (the pigeonhole blocking is provably lossless within the
    * radius). */
  val q33_simhash_pairs: Q = (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))

  val q33_oracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       hashes AS (
         SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
       bits AS (
         SELECT doc_id, b,
           CASE WHEN sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
                         THEN 1 ELSE -1 END) > 0
                THEN 1 ELSE 0 END AS bit
         FROM hashes CROSS JOIN range(64) r(b)
         GROUP BY doc_id, b)
       SELECT id_a, id_b, hamming FROM (
         SELECT a.doc_id AS id_a, bb.doc_id AS id_b,
                CAST(sum(CASE WHEN a.bit <> bb.bit THEN 1 ELSE 0 END)
                     AS BIGINT) AS hamming
         FROM bits a JOIN bits bb
           ON a.b = bb.b AND a.doc_id < bb.doc_id
         GROUP BY 1, 2)
       WHERE hamming <= 3"""

  /** q104: SimHash near-dup pairs with the degenerate-bucket cap
    * BINDING — maxBucket=8 vs measured distinct-signature band buckets
    * up to 41 on this corpus, so the cap genuinely drops buckets (the
    * q95 pattern: the oracle recomputes the CAPPED semantics in SQL
    * rather than assuming identity with the uncapped result). Checks
    * both halves of the degenerate-fingerprint contract at once:
    * identical signatures pre-collapse (their pairs ride the
    * full-hash equi-join, immune to the cap) and only distinct
    * signatures are banded, bucket-counted, and capped. */
  val q104_simhash_capped: Q = (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3, maxBucket = Some(8))
      .select(col("id_a"), col("id_b"), col("hamming"))

  val q104_oracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       hashes AS (
         SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
       bits AS (
         SELECT doc_id, b,
           CASE WHEN sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1
                         THEN 1 ELSE -1 END) > 0
                THEN 1 ELSE 0 END AS bit
         FROM hashes CROSS JOIN range(64) r(b)
         GROUP BY doc_id, b),
       fp AS (
         SELECT doc_id,
           sum(CASE WHEN b // 16 = 0
             THEN CAST(bit AS BIGINT) << CAST(b % 16 AS INTEGER)
             ELSE 0 END) AS b0,
           sum(CASE WHEN b // 16 = 1
             THEN CAST(bit AS BIGINT) << CAST(b % 16 AS INTEGER)
             ELSE 0 END) AS b1,
           sum(CASE WHEN b // 16 = 2
             THEN CAST(bit AS BIGINT) << CAST(b % 16 AS INTEGER)
             ELSE 0 END) AS b2,
           sum(CASE WHEN b // 16 = 3
             THEN CAST(bit AS BIGINT) << CAST(b % 16 AS INTEGER)
             ELSE 0 END) AS b3
         FROM bits GROUP BY 1),
       dfp AS (SELECT DISTINCT b0, b1, b2, b3 FROM fp),
       banded AS (
         SELECT 0 AS band, b0 AS bits, b0, b1, b2, b3 FROM dfp
         UNION ALL SELECT 1, b1, b0, b1, b2, b3 FROM dfp
         UNION ALL SELECT 2, b2, b0, b1, b2, b3 FROM dfp
         UNION ALL SELECT 3, b3, b0, b1, b2, b3 FROM dfp),
       ok AS (SELECT band, bits FROM banded
              GROUP BY 1, 2 HAVING count(*) <= 8),
       capb AS (SELECT bn.* FROM banded bn JOIN ok USING (band, bits)),
       cand AS (
         SELECT DISTINCT
           x.b0 AS xa0, x.b1 AS xa1, x.b2 AS xa2, x.b3 AS xa3,
           y.b0 AS yb0, y.b1 AS yb1, y.b2 AS yb2, y.b3 AS yb3,
           CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
             AS BIGINT) AS hamming
         FROM capb x JOIN capb y ON x.band = y.band AND x.bits = y.bits
         WHERE (x.b0, x.b1, x.b2, x.b3) < (y.b0, y.b1, y.b2, y.b3)),
       eqp AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(0 AS BIGINT) AS hamming
         FROM fp a JOIN fp b
           ON a.b0 = b.b0 AND a.b1 = b.b1 AND a.b2 = b.b2 AND a.b3 = b.b3
          AND a.doc_id < b.doc_id),
       crossp AS (
         SELECT least(a.doc_id, b.doc_id) AS id_a,
           greatest(a.doc_id, b.doc_id) AS id_b, c.hamming
         FROM cand c
         JOIN fp a ON a.b0 = c.xa0 AND a.b1 = c.xa1
                  AND a.b2 = c.xa2 AND a.b3 = c.xa3
         JOIN fp b ON b.b0 = c.yb0 AND b.b1 = c.yb1
                  AND b.b2 = c.yb2 AND b.b3 = c.yb3
         WHERE c.hamming <= 3)
       SELECT id_a, id_b, hamming FROM eqp
       UNION ALL SELECT id_a, id_b, hamming FROM crossp"""

  /** q34: order-sensitive rolling-hash fingerprint per document (detects
    * token reorderings that md5-of-text misses). The fold runs in a
    * 52-bit md5-derived space (see rollingHash), so — like q33's
    * SimHash — it now runs under a REAL DuckDB oracle (list_reduce with
    * the identical rotate-xor fold) instead of a rows-only check. */
  val q34_rolling_fingerprint: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      rollingHash(col("text")).as("rhash"))

  val q34_oracle: String =
    """SELECT doc_id,
         list_reduce(
           list_prepend(0, list_transform(string_split(text, ' '),
             t -> CAST(('0x' || substr(md5(t), 1, 13)) AS BIGINT))),
           (acc, h) -> xor((acc * 32) % 4503599627370496
                             + acc // 140737488355328, h)) AS rhash
       FROM documents"""

  /** q35: language-ID heuristic — score each doc against tiny per-lang
    * stopword lexicons, predict argmax (ties → lexicon order), compare
    * with the labeled lang. Deterministic; oracle-checkable via CASE. */
  val q35_langid: Q = (s, d) => {
    val t = col("text")
    val scores = Seq("en", "es", "fr", "de", "zh")
      .map(l => (l, lexiconHits(t, langLexicons(l))))
    // argmax with first-wins tie-break, mirrored in the oracle CASE chain
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (l, sc)) =>
        when(sc > acc.getField("score"),
          struct(sc.as("score"), lit(l).as("lang"))).otherwise(acc)
    }
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      best.getField("lang").as("pred_lang"),
      best.getField("score").as("pred_hits"))
  }

  val q35_oracle: String = {
    def hits(lex: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), w -> w IN (${lex.map("'" + _ + "'").mkString(",")})))"
    val en = hits(langLexicons("en")); val es = hits(langLexicons("es"))
    val fr = hits(langLexicons("fr")); val de = hits(langLexicons("de"))
    val zh = hits(langLexicons("zh"))
    s"""SELECT doc_id, lang,
       CASE
         WHEN $zh > greatest($en, $es, $fr, $de) THEN 'zh'
         WHEN $de > greatest($en, $es, $fr) THEN 'de'
         WHEN $fr > greatest($en, $es) THEN 'fr'
         WHEN $es > $en THEN 'es'
         ELSE 'en' END AS pred_lang,
       CAST(greatest($en, $es, $fr, $de, $zh) AS BIGINT) AS pred_hits
       FROM documents"""
  }

  /** q55: BPE-style pre-tokenization — regex token classes (letter runs /
    * digit runs / punctuation runs) via regexp_extract_all, the counting
    * shape of an LLM tokenizer's pre-tokenizer. Pattern kept to RE2-safe
    * constructs so the oracle regex semantics match exactly. */
  val q55_bpe_tokens: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))).cast("long")
        .as("n_pretokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
        .cast("long").as("n_alpha_runs"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_digit_runs"))

  val q55_oracle: String =
    """SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+'))
            AS BIGINT) AS n_pretokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
         AS n_alpha_runs,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
         AS n_digit_runs
       FROM documents"""

  /** q66: near-dup CLUSTERS — connected components over the
    * MinHash-LSH pair graph (jac ≥ 0.5), every document labeled with
    * the min doc_id reachable from it. Pairwise survivor-picking (q32)
    * is only exact on cliques; chains A–B–C need this transitive
    * closure. The oracle recomputes the same edges exactly (the q31
    * identity) and closes them with a recursive CTE. */
  val q66_neardup_components: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5)
    Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id", pairs)
      .select(col("id").as("doc_id"), col("component"))
  }

  val q66_oracle: String =
    """WITH RECURSIVE
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh),
       p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         HAVING CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5),
       e AS (SELECT id_a AS src, id_b AS dst FROM p
             UNION SELECT id_b, id_a FROM p),
       reach(id, r) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id)
       SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
       FROM reach GROUP BY id"""

  /** q67: corpus vocabulary — top-20 terms per language by frequency
    * (the vocab-building / term-stats pass of a tokenizer pipeline).
    * One explode + one hash agg + a per-lang top-k window; the shuffle
    * keys are (lang, term) then lang, both low-cardinality-friendly. */
  val q67_term_freq: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val counts = tok.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("term"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("lang"), col("term"), col("n"), col("rank"))
  }

  val q67_oracle: String =
    """WITH tok AS (
         SELECT lang, unnest(string_split(text, ' ')) AS term
         FROM documents),
       counts AS (
         SELECT lang, term, count(*) AS n FROM tok
         WHERE term <> '' GROUP BY lang, term)
       SELECT lang, term, n, rank FROM (
         SELECT lang, term, n,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY n DESC, term) AS BIGINT) AS rank
         FROM counts)
       WHERE rank <= 20"""

  /** q68: per-document repetition ratio — the share of the most
    * frequent term (a standard low-quality/template-text filter in
    * training-data pipelines). Two hash aggs, both keyed by doc_id, so
    * the second collapses into the first's partitioning. */
  val q68_repetition: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        max(col("c")).as("top_term_n"),
        (max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as("repetition"))
  }

  val q68_oracle: String =
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents),
       tc AS (
         SELECT doc_id, term, count(*) AS c FROM tok
         WHERE term <> '' GROUP BY doc_id, term)
       SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         max(c) AS top_term_n,
         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS repetition
       FROM tc GROUP BY doc_id"""

  /** q69: deterministic stratified sample — up to 20 docs per language
    * in md5-of-id order (partition-independent, reproducible in ANY
    * engine, which is exactly why it oracles; Spark's seeded df.sample
    * is partition-dependent and would not). The balanced-subsample
    * primitive of a training-data pipeline. */
  val q69_stratified_sample: Q = (s, d) =>
    graft.operators.Sample.stratified(
        Tables.documents(s, d), Seq("lang"), "doc_id", 20)
      .select(col("lang"), col("doc_id"), col("rank"))

  val q69_oracle: String =
    """SELECT lang, doc_id, rank FROM (
         SELECT lang, doc_id,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rank
         FROM documents)
       WHERE rank <= 20"""

  /** q70: sequence packing — documents packed into ~64 KiB bins by a
    * running character total in doc_id order (the LM-training
    * chunk-assembly shape). The running total goes through the
    * distributed two-pass prefix sum (operators.PrefixSum) — a naive
    * orderBy window with no partitionBy would funnel the corpus
    * through one task. Any cum error shifts a bin boundary, so the
    * per-bin aggregate is a sharp oracle. */
  val q70_sequence_pack: Q = (s, d) => {
    val withCum = graft.operators.PrefixSum.withRunningTotal(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      orderCols = Seq("doc_id"), valueCol = "n_chars")
    withCum
      .withColumn("bin", floor((col("n_chars_cum") - col("n_chars"))
        .cast("double") / 65536.0).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val q70_oracle: String =
    """WITH c AS (
         SELECT doc_id, n_chars,
           sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM documents)
       SELECT CAST(floor((cum - n_chars) / 65536.0) AS BIGINT) AS bin,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM c GROUP BY 1"""

  /** q72: benchmark decontamination — corpus docs (id ≥ 20) sharing at
    * least one distinct 5-gram with the "eval set" (docs 0-19), with
    * the match count. One corpus scan + a broadcast of the small probe
    * shingle set — the pre-training contamination sweep. */
  val q72_decontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.contaminatedDocs(
        docs.filter(col("doc_id") >= 20), "text", "doc_id",
        docs.filter(col("doc_id") < 20), "text", n = 5)
      .select(col("id").as("doc_id"), col("n_matched"))
  }

  val q72_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                  FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 3),
           i -> array_to_string(toks[i:i+4], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
       probe AS (SELECT DISTINCT s FROM ex WHERE doc_id < 20)
       SELECT e.doc_id AS doc_id,
         CAST(count(DISTINCT e.s) AS BIGINT) AS n_matched
       FROM ex e JOIN probe p ON e.s = p.s
       WHERE e.doc_id >= 20
       GROUP BY e.doc_id"""

  /** q73: the whole pipeline in one query — exact dedup (keep min id
    * per fingerprint), length-band quality filter, deterministic
    * stratified sample (≤10 per language), per-language stats. Every
    * stage is an operator verified on its own elsewhere; this gate
    * checks they COMPOSE — the "a user runs their corpus job on this
    * engine" shape. */
  val q73_pipeline: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val survivors = Dedup.exactSurvivors(
      docs.withColumn("fp", fingerprint(col("text"))),
      col("fp"), col("doc_id"))
    val quality = survivors
      .filter(col("n_chars") >= 200 && col("n_chars") <= 4000)
    val sampled = graft.operators.Sample.stratified(
      quality, Seq("lang"), "doc_id", 10)
    sampled.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_doc"))
  }

  val q73_oracle: String =
    """WITH survivors AS (
         SELECT * FROM (
           SELECT d.*, row_number() OVER (PARTITION BY md5(lower(text))
             ORDER BY doc_id) AS rn
           FROM documents d) WHERE rn = 1),
       quality AS (
         SELECT * FROM survivors
         WHERE n_chars >= 200 AND n_chars <= 4000),
       sampled AS (
         SELECT * FROM (
           SELECT q.*, row_number() OVER (PARTITION BY lang
             ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS srn
           FROM quality q) WHERE srn <= 10)
       SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         min(doc_id) AS min_doc
       FROM sampled GROUP BY lang"""

  /** q75: PII redaction — emails, phone-shaped groups, then residual
    * long digit runs are masked in one codegen'd regexp chain
    * (operators restricted to the Java∩RE2 regex subset so the SAME
    * definition runs under the DuckDB oracle). The corpus tables carry
    * no PII, so the gate synthesizes a contact line per customer from
    * stable columns — deterministic, and it exercises every mask plus
    * the must-NOT-match cases (short digit runs survive). */
  val q75_redact_pii: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      redactPii(concat(
        col("c_name"), lit(" <"),
        lower(regexp_replace(col("c_name"), "#", ".")),
        lit("@example.com> ext "),
        (col("c_custkey") % 100).cast("string"),
        lit(" ref 555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
        .as("redacted"))

  val q75_oracle: String =
    """WITH raw AS (SELECT c_custkey,
         c_name || ' <' || lower(replace(c_name, '#', '.')) ||
         '@example.com> ext ' || CAST(c_custkey % 100 AS VARCHAR) ||
         ' ref 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           AS txt
       FROM customer)
       SELECT c_custkey,
         regexp_replace(regexp_replace(regexp_replace(txt,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\b[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?\b', '[PHONE]', 'g'),
           '[0-9]{6,}', '[NUM]', 'g') AS redacted
       FROM raw"""

  /** q77: BM25 keyword relevance (operators.Bm25) — top-100 documents
    * against a fixed term profile. The emitted surface is the RANK, not
    * the raw score: both engines compute bit-identical ln() inputs (all
    * integer-derived doubles, identical operation order) but libm ln
    * itself may differ in the final ulp; ordering is ulp-robust. */
  val q77_bm25_topk: Q = (s, d) =>
    graft.operators.Bm25.topK(Tables.documents(s, d), "text", "doc_id",
      terms = Seq("spark", "query", "vector", "hash", "window"), k = 100)

  val q77_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       base AS (SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS dl,
         CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf0,
         CAST(len(list_filter(toks, x -> x = 'query')) AS DOUBLE) AS tf1,
         CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf2,
         CAST(len(list_filter(toks, x -> x = 'hash')) AS DOUBLE) AS tf3,
         CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf4
       FROM t),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(dl) / count(*) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2,
         sum(CASE WHEN tf3 > 0 THEN 1.0 ELSE 0.0 END) AS df3,
         sum(CASE WHEN tf4 > 0 THEN 1.0 ELSE 0.0 END) AS df4
       FROM base),
       sc AS (SELECT doc_id,
           ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * (1.2 + 1.0))
             / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * (1.2 + 1.0))
             / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * (1.2 + 1.0))
             / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln((n - df3 + 0.5) / (df3 + 0.5) + 1.0) * (tf3 * (1.2 + 1.0))
             / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
         + ln((n - df4 + 0.5) / (df4 + 0.5) + 1.0) * (tf4 * (1.2 + 1.0))
             / (tf4 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
           AS score
       FROM base, st)
       SELECT doc_id, rk FROM (
         SELECT doc_id, CAST(row_number() OVER
           (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         FROM sc)
       WHERE rk <= 100"""

  /** q78: deterministic train/val/test assignment (operators.Sample
    * .splitAssign) — 80/10/10 by md5-hex threshold, a pure STRING
    * comparison that reproduces bit-for-bit in any engine and under any
    * partitioning. Gate checks per-split counts plus id/char checksums,
    * so one row switching splits fails loudly. */
  val q78_split_assign: Q = (s, d) =>
    graft.operators.Sample.splitAssign(Tables.documents(s, d), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"),
        sum(col("n_chars")).cast("long").as("total_chars"))

  val q78_oracle: String =
    """SELECT CASE
         WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
           < 'cccccccc' THEN 'train'
         WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
           < 'e6666666' THEN 'val'
         ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
       FROM documents GROUP BY 1"""

  /** q82: incremental dedup (operators.Dedup.incrementalSurvivors) —
    * docs 450+ arrive as the "new delivery" and are deduped within the
    * batch (min id per fingerprint) AND against the already-ingested
    * corpus (docs < 450), without shuffling or re-fingerprinting the
    * corpus beyond one streaming scan. */
  val q82_incremental_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Dedup.incrementalSurvivors(
        docs.filter(col("doc_id") >= 450),
        docs.filter(col("doc_id") < 450),
        df => fingerprint(df("text")), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val q82_oracle: String =
    """WITH b AS (SELECT doc_id, lang, n_chars, md5(lower(text)) AS fp
                  FROM documents WHERE doc_id >= 450),
       c AS (SELECT DISTINCT md5(lower(text)) AS fp
             FROM documents WHERE doc_id < 450),
       k AS (SELECT doc_id, lang, n_chars, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             FROM b)
       SELECT doc_id, lang, n_chars FROM k
       WHERE rn = 1 AND fp NOT IN (SELECT fp FROM c)"""

  /** q112: LARGE-delta incremental dedup — q82's semantics through the
    * bloom-broadcast path (Dedup.incrementalSurvivorsLarge): when the
    * delta is too big to broadcast its exact fingerprint set, a fixed-
    * size bloom rides to the corpus scan instead and an exact shuffled
    * semi-join kills the false positives. Same fixture split and the
    * SAME oracle SQL as q82 — the gate pins that the sketch path is
    * bit-identical to exact dedup at any fpp (here 3%, small enough
    * corpus that real false positives are exercised by DedupSpec's
    * fpp=0.5 torture test instead). */
  val q112_incremental_dedup_large: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Dedup.incrementalSurvivorsLarge(
        docs.filter(col("doc_id") >= 450),
        docs.filter(col("doc_id") < 450),
        df => fingerprint(df("text")), col("doc_id"),
        expectedKeys = 1000L, fpp = 0.03)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  val q112_oracle: String = q82_oracle

  /** q84: document chunking (TextFunctions.chunkTokens) — 128-token
    * windows at stride 64, exploded to one row per chunk with its token
    * count and content fingerprint. The LM-training chunk-assembly
    * front half (q70's sequence packing is the back half). Slice-clamp
    * semantics agree between engines, so the gate is oracle-exact down
    * to the ragged last chunk of every document. */
  val q84_chunk_tokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(chunkTokens(col("text"), window = 128, stride = 64))
          .as(Seq("ci", "chunk")))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_id"),
        nTokens(col("chunk")).as("n_chunk_tokens"),
        fingerprint(col("chunk")).as("chunk_fp"))

  val q84_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id, toks,
               unnest(range(0, ((len(toks) - 1) // 64) + 1)) AS ci
             FROM t),
       ch AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
               array_to_string(toks[ci*64 + 1 : ci*64 + 128], ' ') AS chunk
             FROM c)
       SELECT doc_id, chunk_id,
         CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens,
         md5(lower(chunk)) AS chunk_fp
       FROM ch"""

  /** q86: training-mix weights (operators.Sample.weightedMix) — keep
    * 100% of en, 50% of es, 25% of fr, 10% of everything else, by
    * per-language md5 thresholds. Deterministic, nesting, and
    * engine-portable, so the per-language counts and id checksums are
    * oracle-exact; one row flipping in or out of the mix fails the
    * gate. */
  val q86_weighted_mix: Q = (s, d) =>
    graft.operators.Sample.weightedMix(Tables.documents(s, d),
        "lang", "doc_id",
        Map("en" -> 1.0, "es" -> 0.5, "fr" -> 0.25), defaultRate = 0.1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"))

  val q86_oracle: String =
    """WITH b AS (SELECT doc_id, lang,
         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) AS u
       FROM documents)
       SELECT lang, count(*) AS n_docs,
         CAST(sum(doc_id) AS BIGINT) AS id_sum
       FROM b
       WHERE u < CASE lang WHEN 'en' THEN 4294967296
                           WHEN 'es' THEN 2147483648
                           WHEN 'fr' THEN 1073741824
                           ELSE 429496729 END
       GROUP BY lang"""

  /** q90: substring-level dedup spans — ExactSubstr (Lee et al.
    * arXiv:2107.06499) as a distributed inverted-index op: 5-token
    * windows shared by ≥2 documents, merged into maximal per-doc spans.
    * Plan: gram-keyed agg + semi join, then one doc_id exchange shared
    * by the islands window and the span aggregate. */
  val q90_repeated_spans: Q = (s, d) =>
    Dedup.repeatedSpans(Tables.documents(s, d), "doc_id", "text",
      k = 5, minDocs = 2)

  val q90_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
         FROM documents),
       g AS (SELECT doc_id, CAST(u.i AS INT) - 1 AS pos,
           array_to_string(list_slice(a, u.i, u.i + 4), ' ') AS gram
         FROM t, unnest(range(1, greatest(len(a) - 3, 1))) u(i)),
       dup AS (SELECT gram FROM g GROUP BY gram
         HAVING count(DISTINCT doc_id) >= 2),
       f AS (SELECT doc_id, pos FROM g
         WHERE gram IN (SELECT gram FROM dup)),
       b AS (SELECT doc_id, pos,
           CASE WHEN lag(pos) OVER w IS NULL
                  OR pos > lag(pos) OVER w + 4 THEN 1 ELSE 0 END AS brk
         FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       i AS (SELECT doc_id, pos, sum(brk) OVER
           (PARTITION BY doc_id ORDER BY pos) AS grp FROM b)
       SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + 4 AS BIGINT) AS span_end,
         CAST(count(*) AS BIGINT) AS n_windows
       FROM i GROUP BY doc_id, grp"""

  /** q91: the remove step of substring-level dedup — drop every token
    * inside a q90 span, rejoin survivors per document. */
  val q91_span_scrub: Q = (s, d) =>
    Dedup.scrubRepeatedSpans(Tables.documents(s, d), "doc_id", "text",
      k = 5, minDocs = 2)

  val q91_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
         FROM documents),
       g AS (SELECT doc_id, CAST(u.i AS INT) - 1 AS pos,
           array_to_string(list_slice(a, u.i, u.i + 4), ' ') AS gram
         FROM t, unnest(range(1, greatest(len(a) - 3, 1))) u(i)),
       dup AS (SELECT gram FROM g GROUP BY gram
         HAVING count(DISTINCT doc_id) >= 2),
       f AS (SELECT doc_id, pos FROM g
         WHERE gram IN (SELECT gram FROM dup)),
       b AS (SELECT doc_id, pos,
           CASE WHEN lag(pos) OVER w IS NULL
                  OR pos > lag(pos) OVER w + 4 THEN 1 ELSE 0 END AS brk
         FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       i AS (SELECT doc_id, pos, sum(brk) OVER
           (PARTITION BY doc_id ORDER BY pos) AS grp FROM b),
       spans AS (SELECT doc_id, min(pos) AS s0, max(pos) + 4 AS s1
         FROM i GROUP BY doc_id, grp),
       tok AS (SELECT doc_id, CAST(u.i AS INT) - 1 AS pos, a[u.i] AS tok
         FROM t, unnest(range(1, len(a) + 1)) u(i)),
       kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
         WHERE NOT EXISTS (SELECT 1 FROM spans s
           WHERE s.doc_id = tk.doc_id AND tk.pos BETWEEN s.s0 AND s.s1))
       SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
       FROM kept GROUP BY doc_id"""

  /** q94: bigram-LM perplexity ranking (operators.NgramLm) — the 25
    * least fluent documents under the corpus's own add-one-smoothed
    * bigram model, the CCNet-style junk filter. The gate surface is
    * the id-tiebroken RANK of the mean log-prob (ln differs in the
    * last ulp between libm implementations; rank order does not — the
    * q77 rule). Scale: two count aggs + ONE scoring join on the gram
    * key; c(w1) is denormalized into the LM at train time. */
  val q94_lm_perplexity: Q = (s, d) =>
    graft.operators.NgramLm.worstK(
      Tables.documents(s, d), "doc_id", "text", 25)

  val q94_oracle: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       uni AS (
         SELECT u.tok, count(*) AS c1 FROM (
           SELECT unnest(a) AS tok FROM t) u GROUP BY u.tok),
       v AS (SELECT count(*) AS vs FROM uni),
       big AS (
         SELECT doc_id, unnest(list_transform(range(1, len(a)),
           i -> a[i] || ' ' || a[i + 1])) AS gram
         FROM t),
       bc AS (SELECT gram, count(*) AS c12 FROM big GROUP BY gram),
       sc AS (
         SELECT b.doc_id,
           sum(ln((bc.c12 + 1.0) / (u.c1 + v.vs + 0.0))) / count(*)
             AS lp
         FROM big b
         JOIN bc USING (gram)
         JOIN uni u ON u.tok = split_part(b.gram, ' ', 1)
         CROSS JOIN v
         GROUP BY b.doc_id)
       SELECT doc_id,
         CAST(row_number() OVER (ORDER BY lp ASC, doc_id) AS BIGINT)
           AS rk
       FROM sc ORDER BY lp ASC, doc_id LIMIT 25"""

  /** q95: directed shingle-containment pairs
    * (operators.Dedup.containmentPairs) — |A∩B|/|A| ≥ 0.8 over distinct
    * 3-gram shingles, the asymmetric near-dup measure that catches a
    * short document quoted whole inside a longer one (containment ≈ 1
    * where symmetric Jaccard ≈ |A|/|B| stays tiny). Inverted-index
    * self-join — cost Σ df², never n².
    *
    * The gate runs the CAPPED form — `maxDf = 5` is BINDING on this
    * corpus (shingle df reaches 7 at sf0.01), so the df-cap path — the
    * 100 TB plan, where boilerplate shingles would otherwise blow up
    * the index join — is what the oracle hash-matches: the DuckDB SQL
    * recomputes the identical capped semantics (df filter applied to
    * the index AND to the `na` denominator). Verdict r08 item 3. */
  val q95_containment_pairs: Q = (s, d) =>
    Dedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
      n = 3, minContainment = 0.8, maxDf = 5)

  val q95_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
         FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, unnest(shingles) s FROM sh),
       rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 5),
       exr AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
       na AS (SELECT doc_id, count(*) AS n FROM exr GROUP BY doc_id)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS common, any_value(na.n) AS na,
         CAST(count(*) AS DOUBLE) / any_value(na.n) AS containment
       FROM exr a JOIN exr b ON a.s = b.s AND a.doc_id <> b.doc_id
       JOIN na ON na.doc_id = a.doc_id
       GROUP BY a.doc_id, b.doc_id
       HAVING CAST(count(*) AS DOUBLE) / any_value(na.n) >= 0.8"""

  /** q96: source-priority survivor selection
    * (operators.Dedup.prioritySurvivors) — one document per near-dup
    * cluster, keeping the copy from the most-trusted source (min
    * numeric source suffix, doc_id tiebreak) instead of blindly the
    * min id. Clusters are q66's connected components over the
    * MinHash-LSH graph. At k=64/bands=32 candidate recall at j=0.5 is
    * near-certain (~0.9999) and exact on this fixture's planted
    * duplicates (jaccard ≈ 0.98 — every true pair agrees on ~31 of 32
    * bands), which is why the whole policy runs under an exact-Jaccard
    * DuckDB oracle (ADVICE r08: near-certain in general, exact on this
    * band of the fixture, not provable at arbitrary jaccard).
    *
    * The gate runs WITH the LSH bucket cap (`maxBucket = 50`) — the
    * 100 TB path `prioritySurvivors` assumes upstream (its window skew
    * bound is the bucket cap). The cap is identity-safe here: a true
    * pair is lost only if EVERY band it agrees on holds a bucket of
    * >50 docs, and planted clusters are ≤3 docs with ~31 agreeing
    * bands. The priority is `try_cast` (plain ANSI cast would CRASH on
    * a non-conforming source id) and a null priority sorts LAST — see
    * the prioritySurvivors null contract. Verdict r08 items 3+5. */
  val q96_priority_survivors: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 3, k = 64, bands = 32, minJaccard = 0.5, maxBucket = Some(50))
    Dedup.prioritySurvivors(docs, "doc_id", pairs,
        substring(col("source"), 4, 16).try_cast("int"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  val q96_oracle: String =
    """WITH RECURSIVE
       t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) n, unnest(shingles) s FROM sh),
       p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         HAVING CAST(count(*) AS DOUBLE)
           / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5),
       e AS (SELECT id_a AS src, id_b AS dst FROM p
             UNION SELECT id_b, id_a FROM p),
       reach(id, r) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id),
       comp AS (SELECT id AS doc_id, min(r) AS component
         FROM reach GROUP BY id),
       ranked AS (
         SELECT d.doc_id, d.lang, d.source, d.n_chars,
           row_number() OVER (PARTITION BY c.component
             ORDER BY CAST(substr(d.source, 4) AS INT), d.doc_id) AS rn
         FROM documents d JOIN comp c USING (doc_id))
       SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1"""

  /** q134: sequence packing (Packing.concatChunk scaladoc — GPT-style
    * concat-and-chunk onto 256-token training sequences). The exact
    * global token offset comes from the DISTRIBUTED two-pass prefix
    * scan (PrefixSum), not a single-task window; the oracle computes
    * the same running total with a plain window (fine at oracle scale)
    * and the same floor divisions. Docs span 10–99 tokens, so straddle
    * placements (first_seq < last_seq) occur corpus-wide and the
    * boundary arithmetic is load-bearing. */
  val q134_sequence_packing: Q = (s, d) =>
    graft.operators.Packing.concatChunk(
      Tables.documents(s, d)
        .select(col("doc_id"), nTokens(col("text")).as("n_tok")),
      "doc_id", "n_tok", seqLen = 256)

  val q134_packing_oracle: String =
    """WITH s AS (SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       FROM documents),
       c AS (SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       FROM s)
       SELECT doc_id, n AS n_tokens,
         CAST(cum - n AS BIGINT) AS tok_start,
         CAST((cum - n) // 256 AS BIGINT) AS first_seq,
         CAST(CASE WHEN n > 0 THEN (cum - 1) // 256
              ELSE (cum - n) // 256 END AS BIGINT) AS last_seq,
         CAST((cum - n) % 256 AS BIGINT) AS seq_offset
       FROM c"""

  /** q180: ALIGNED sequence packing (Packing.alignedPack scaladoc —
    * buddy-allocation layout: pad to the next power of two, lay out by
    * prefix sum in (pad DESC, id) order; no document ever straddles a
    * sequence boundary, the cross-contamination-free loader shape).
    * The oracle replays the identical CASE-chain quantization and the
    * same running total with a plain window; bin/offset/waste are all
    * integer arithmetic so the gate is hash-exact. Docs span 10–99
    * tokens against seqLen=128, so every pad level 16/32/64/128 is
    * exercised and multi-doc bins occur corpus-wide. */
  val q180_aligned_packing: Q = (s, d) =>
    graft.operators.Packing.alignedPack(
      Tables.documents(s, d)
        .select(col("doc_id"), nTokens(col("text")).as("n_tok")),
      "doc_id", "n_tok", seqLen = 128)

  val q180_aligned_oracle: String =
    """WITH s AS (SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       FROM documents),
       q AS (SELECT doc_id, n,
         CAST(CASE WHEN n <= 1 THEN 1 WHEN n <= 2 THEN 2
              WHEN n <= 4 THEN 4 WHEN n <= 8 THEN 8
              WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
              WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
              END AS BIGINT) AS pad
       FROM s),
       c AS (SELECT doc_id, n, pad,
         sum(pad) OVER (ORDER BY pad DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
       FROM q)
       SELECT doc_id, n AS n_tokens, pad AS pad_len,
         CAST((cum - pad) // 128 AS BIGINT) AS bin,
         CAST((cum - pad) % 128 AS BIGINT) AS bin_offset,
         CAST(pad - n AS BIGINT) AS waste
       FROM c"""

  /** q183: temperature-based mixture reweighting
    * (Sample.temperatureMix scaladoc — the mC4/mT5 α-sampling recipe,
    * α=1/2: per-language keep-rates r = (n_min/n_lang)^(1/2) derived
    * IN-PLAN from the corpus's own counts; the survivor composition is
    * ∝ √n_lang, upweighting low-resource languages). The reference
    * corpus is genuinely skewed (en 218 vs fr 64 at sf0.01), so every
    * language gets a different data-dependent threshold; the oracle
    * recomputes thresholds with the same sqrt/divide/multiply chain —
    * correctly rounded IEEE ops, so they match bit-for-bit — and
    * replays the salted-md5 cut. Output aggregated per language
    * (count + id checksum) to keep the gate surface small while
    * pinning the exact survivor set. */
  val q183_temperature_mix: Q = (s, d) =>
    graft.operators.Sample.temperatureMix(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", alpha = 0.5, maxRate = 1.0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("id_sum"))

  val q183_temperature_oracle: String =
    """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS ns
         FROM documents GROUP BY lang),
       mn AS (SELECT min(ns) AS nmin FROM n),
       th AS (SELECT lang,
         CAST(floor(1.0 * sqrt(CAST(nmin AS DOUBLE) / ns)
           * 4294967296.0) AS BIGINT) AS lim
       FROM n CROSS JOIN mn),
       b AS (SELECT doc_id, lang,
         CAST(('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) AS u
       FROM documents)
       SELECT b.lang, count(*) AS n_docs,
         CAST(sum(b.doc_id) AS BIGINT) AS id_sum
       FROM b JOIN th ON b.lang IS NOT DISTINCT FROM th.lang
       WHERE b.u < th.lim GROUP BY b.lang"""

  /** q184: CCNet perplexity bucketing (NgramLm.perplexityBuckets
    * scaladoc — Wenzek et al. arXiv:1911.00359 §4.3: per-language
    * head/middle/tail terciles by LM fluency, the standard web-corpus
    * quality partition). Exact integer-rank cuts in (logprob DESC, id)
    * order; ranks ride the distributed PrefixSum scan, never a
    * per-language single-task window. The oracle replays q94's LM CTE
    * plus the tercile CASE per language — only boundary documents
    * depend on score comparisons (gaps ≥ 3.6e-5 on this corpus, the
    * q94 rank-surface argument). */
  val q184_perplexity_buckets: Q = (s, d) =>
    graft.operators.NgramLm.perplexityBuckets(
      Tables.documents(s, d), "doc_id", "text", "lang")

  val q184_buckets_oracle: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       uni AS (
         SELECT u.tok, count(*) AS c1 FROM (
           SELECT unnest(a) AS tok FROM t) u GROUP BY u.tok),
       v AS (SELECT count(*) AS vs FROM uni),
       big AS (
         SELECT doc_id, unnest(list_transform(range(1, len(a)),
           i -> a[i] || ' ' || a[i + 1])) AS gram
         FROM t),
       bc AS (SELECT gram, count(*) AS c12 FROM big GROUP BY gram),
       sc AS (
         SELECT b.doc_id,
           sum(ln((bc.c12 + 1.0) / (u.c1 + v.vs + 0.0))) / count(*)
             AS lp
         FROM big b
         JOIN bc USING (gram)
         JOIN uni u ON u.tok = split_part(b.gram, ' ', 1)
         CROSS JOIN v
         GROUP BY b.doc_id),
       r AS (SELECT s.doc_id, d.lang,
           row_number() OVER (PARTITION BY d.lang
             ORDER BY s.lp DESC, s.doc_id) AS rn,
           count(*) OVER (PARTITION BY d.lang) AS n
         FROM sc s JOIN documents d USING (doc_id))
       SELECT doc_id, lang,
         CASE WHEN 3 * rn <= n THEN 'head'
              WHEN 3 * rn <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
       FROM r"""

  /** q139: curation telemetry — the per-source funnel report a
    * pipeline owner actually reads: docs/kept counts plus PER-RULE
    * fire counts (reasons string exploded back to rules), one row per
    * (source, rule) with an '_all' rollup row per source. Composes
    * q133's funnel (zero-shuffle projection) with one source-keyed
    * partial agg + one explode-agg; integer counts only. */
  val q139_funnel_by_source: Q = (s, d) => {
    val v = graft.operators.Curation.gopherFunnel(
        Tables.documents(s, d), "doc_id", "text",
        minTokens = 30, maxTokens = 90,
        minAvgWordLenX10 = 40, maxAvgWordLenX10 = 100,
        minStopwords = 2, maxTop2Pct = 20)
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
    val totals = v.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        count(when(col("kept"), lit(1))).as("n_kept"))
      .select(col("source"), lit("_all").as("rule"), col("n"),
        col("n_kept"))
    val byRule = v.filter(col("reasons") =!= "")
      .select(col("source"),
        explode(split(col("reasons"), ",")).as("rule"))
      .groupBy(col("source"), col("rule"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_kept", lit(0L))
    totals.unionByName(byRule)
  }

  val q139_funnel_src_oracle: String = {
    val funnel = """SELECT s.doc_id, d.source, reasons,
           (reasons = '') AS kept
         FROM (SELECT doc_id,
             concat_ws(',',
               CASE WHEN n < 30 THEN 'too_short' END,
               CASE WHEN n > 90 THEN 'too_long' END,
               CASE WHEN chars * 10 < 40 * n
                      OR chars * 10 > 100 * n THEN 'word_len' END,
               CASE WHEN stop < 2 THEN 'stopwords' END,
               CASE WHEN top2 * 2 * 100 >= 20 * n
                    THEN 'repetition' END) AS reasons
           FROM (SELECT doc_id, n, chars, stop,
               COALESCE((SELECT max(c) FROM (
                 SELECT count(*) c FROM (
                   SELECT a[CAST(i AS INT)] || ' '
                     || a[CAST(i + 1 AS INT)] AS gram
                   FROM unnest(range(1, len(a))) u(i))
                 GROUP BY gram)), 0) AS top2
             FROM (SELECT doc_id, string_split(text, ' ') AS a,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
                 CAST(list_sum(list_transform(string_split(text, ' '),
                   w -> length(w))) AS BIGINT) AS chars,
                 CAST(len(list_filter(string_split(text, ' '), w -> w IN
                   ('the','a','of','and','to','in','is'))) AS BIGINT)
                   AS stop
               FROM documents))) s
         JOIN documents d ON d.doc_id = s.doc_id"""
    s"""WITH v AS ($funnel)
       SELECT source, '_all' AS rule, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept
       FROM v GROUP BY source
       UNION ALL
       SELECT source, u.rule, CAST(count(*) AS BIGINT),
         CAST(0 AS BIGINT)
       FROM v, unnest(string_split(reasons, ',')) u(rule)
       WHERE reasons <> '' GROUP BY source, u.rule"""
  }

  /** q143: leakage-safe train/val/test split
    * (Sample.groupedSplitAssign) — split assignment at the
    * duplicate-GROUP grain so exact copies can never straddle a
    * split boundary: the corpus doubles every document under a
    * remapped id (the q37/q63 near-dup shape), the group key is the
    * md5 text fingerprint, and each copy inherits the KEEPER's
    * 80/10/10 assignment. The oracle recomputes keeper selection and
    * the salted-hash thresholds closed-form — a per-doc (leaky)
    * assignment differs for every remapped twin whose own hash
    * crosses a boundary, so leakage-safety is what the hash gate
    * checks. */
  val q143_grouped_split: Q = (s, d) => {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    graft.operators.Sample.groupedSplitAssign(corpus, "doc_id",
        fingerprint(col("text")),
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select(col("doc_id"), col("split"))
  }

  val q143_grouped_split_oracle: String =
    """WITH u AS (SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 100000, text FROM documents),
       k AS (SELECT md5(lower(text)) AS fp, min(doc_id) AS keeper
         FROM u GROUP BY md5(lower(text))),
       a AS (SELECT fp,
           CASE WHEN substr(md5('split:' || keeper), 1, 8) < 'cccccccc'
                THEN 'train'
                WHEN substr(md5('split:' || keeper), 1, 8) < 'e6666666'
                THEN 'val'
                ELSE 'test' END AS split
         FROM k)
       SELECT u.doc_id, a.split
       FROM u JOIN a ON a.fp = md5(lower(u.text))"""

  /** q142: character-level junk signals (Curation.charStats) — exact
    * Simpson concentration Σ n_c(n_c−1) and longest char run per doc,
    * computed as per-row folds (zero shuffles; the entropy-style
    * filter WITHOUT the ln() that would force a rank surface). The
    * fixture appends a doc_id-length '!' run to each text so
    * max_char_run varies corpus-wide and the run logic is
    * load-bearing; the oracle recomputes frequencies by char and runs
    * by gaps-and-islands. */
  val q142_char_stats: Q = (s, d) =>
    graft.operators.Curation.charStats(
      Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" "),
          repeat(lit("!"), (col("doc_id") % 7 + 2).cast("int")))
          .as("page")),
      "doc_id", "page")

  val q142_char_oracle: String =
    """WITH t AS (SELECT doc_id,
         text || ' ' || repeat('!', CAST(doc_id % 7 + 2 AS INT)) AS p
       FROM documents),
       ch AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
           substr(p, CAST(i AS INT), 1) AS c
         FROM t, unnest(range(1, length(p) + 1)) u(i)),
       g AS (SELECT doc_id, c, count(*) AS cnt FROM ch
         GROUP BY doc_id, c),
       simp AS (SELECT doc_id,
           CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS simpson_num
         FROM g GROUP BY doc_id),
       r AS (SELECT doc_id, c,
           i - row_number() OVER (PARTITION BY doc_id, c ORDER BY i)
             AS grp
         FROM ch),
       runs AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_char_run
         FROM (SELECT doc_id, c, grp, count(*) AS cnt FROM r
               GROUP BY doc_id, c, grp) GROUP BY doc_id)
       SELECT t.doc_id, CAST(length(t.p) AS BIGINT) AS n_chars,
         simp.simpson_num, runs.max_char_run,
         CASE WHEN length(t.p) >= 2 THEN
           CAST(simp.simpson_num AS DOUBLE)
             / CAST(length(t.p) * (CAST(length(t.p) AS BIGINT) - 1)
                    AS DOUBLE)
         ELSE 0.0 END AS concentration
       FROM t JOIN simp ON simp.doc_id = t.doc_id
       JOIN runs ON runs.doc_id = t.doc_id"""

  /** q138: boilerplate n-gram mining (Curation.boilerplateNgrams) —
    * top-30 2-grams by DOCUMENT frequency with a df ≥ 2 floor, the
    * blocklist-builder that feeds q111-style filters. Per-doc distinct
    * shingles in the scan, one gram-keyed partial agg, TakeOrdered
    * heap; (df DESC, gram) total order makes the cut deterministic
    * through the fixture's many df ties. */
  val q138_boilerplate_ngrams: Q = (s, d) =>
    graft.operators.Curation.boilerplateNgrams(
      Tables.documents(s, d), "doc_id", "text", n = 2, k = 30,
      minDf = 2)

  val q138_boilerplate_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
         FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks)),
           i -> array_to_string(toks[i:i+1], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, unnest(shingles) gram FROM sh),
       d2 AS (SELECT gram, count(*) AS df FROM ex GROUP BY gram)
       SELECT gram, CAST(df AS BIGINT) AS df FROM d2
       WHERE df >= 2 ORDER BY df DESC, gram LIMIT 30"""

  /** q135: token-budget selection (Packing.tokenBudgetSelect) — the
    * cut that ends a data-selection pass: docs walk in priority order
    * (longest first: −n_chars, then doc_id) and survive while their
    * span STARTS inside an 8000-token budget; the straddler stays
    * whole. The oracle replays the same running total with a window
    * and the same inclusive rule. Distributed two-pass scan + filter,
    * never a single-task window. */
  val q135_token_budget: Q = (s, d) =>
    graft.operators.Packing.tokenBudgetSelect(
      Tables.documents(s, d).select(col("doc_id"),
        nTokens(col("text")).as("n_tok"),
        (-col("n_chars")).as("pri")),
      "doc_id", "n_tok", Seq("pri", "doc_id"), budget = 8000L)

  val q135_budget_oracle: String =
    """WITH s AS (SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         -n_chars AS pri
       FROM documents),
       c AS (SELECT doc_id, n,
         sum(n) OVER (ORDER BY pri, doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
       FROM s)
       SELECT doc_id, n AS n_tokens, CAST(cum - n AS BIGINT) AS tok_start
       FROM c WHERE cum - n < 8000"""

  /** q136: SHUFFLED sequence packing — q134's concat-and-chunk in the
    * standard deterministic training order (md5 of a seed + doc_id,
    * id tiebreak) instead of id order: the "global shuffle, then
    * chunk" step every pretraining loader performs, engine-portable
    * because the order key is a hex md5 both engines compute
    * identically. Same distributed scan; the oracle windows over the
    * same md5 order. */
  val q136_shuffled_packing: Q = (s, d) =>
    graft.operators.Packing.concatChunk(
      Tables.documents(s, d).select(col("doc_id"),
        nTokens(col("text")).as("n_tok"),
        md5(concat(lit("s42:"), col("doc_id").cast("string")))
          .as("shuf")),
      "doc_id", "n_tok", seqLen = 256,
      orderCols = Seq("shuf", "doc_id"))

  val q136_shuffled_oracle: String =
    """WITH s AS (SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         md5('s42:' || doc_id) AS shuf
       FROM documents),
       c AS (SELECT doc_id, n,
         sum(n) OVER (ORDER BY shuf, doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
       FROM s)
       SELECT doc_id, n AS n_tokens,
         CAST(cum - n AS BIGINT) AS tok_start,
         CAST((cum - n) // 256 AS BIGINT) AS first_seq,
         CAST(CASE WHEN n > 0 THEN (cum - 1) // 256
              ELSE (cum - n) // 256 END AS BIGINT) AS last_seq,
         CAST((cum - n) % 256 AS BIGINT) AS seq_offset
       FROM c"""

  /** q133: the Gopher curation FUNNEL end-to-end (Curation.gopherFunnel
    * scaladoc) — every document gets a keep/drop verdict plus the fired
    * rules in fixed order, all integer-exact comparisons
    * (cross-multiplied thresholds, no floats). Thresholds are tuned to
    * the fixture's real distributions (tokens 10–99, avg word length
    * 3.7–5.3, top-2-gram fraction up to 0.31) so EVERY rule fires on
    * some slice of the corpus and the kept set is a non-trivial
    * subset: too_short < 30 tokens, too_long > 90, word_len outside
    * [4.0, 10.0] chars/token, < 2 stopword hits, top-2-gram ≥ 20% of
    * tokens. The oracle replays the entire funnel. */
  val q133_curation_funnel: Q = (s, d) =>
    graft.operators.Curation.gopherFunnel(
      Tables.documents(s, d), "doc_id", "text",
      minTokens = 30, maxTokens = 90,
      minAvgWordLenX10 = 40, maxAvgWordLenX10 = 100,
      minStopwords = 2, maxTop2Pct = 20)

  val q133_curation_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
         FROM documents),
       s AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n,
           CAST(list_sum(list_transform(a, w -> length(w))) AS BIGINT)
             AS chars,
           CAST(len(list_filter(a, w -> w IN
             ('the','a','of','and','to','in','is'))) AS BIGINT) AS stop
         FROM t),
       g2 AS (SELECT doc_id,
           a[CAST(i AS INT)] || ' ' || a[CAST(i + 1 AS INT)] AS gram
         FROM t, unnest(range(1, len(a))) u(i)),
       m2 AS (SELECT doc_id, max(c) AS top2 FROM (
           SELECT doc_id, gram, count(*) c FROM g2
           GROUP BY doc_id, gram) GROUP BY doc_id),
       r AS (SELECT s.doc_id, s.n,
           concat_ws(',',
             CASE WHEN s.n < 30 THEN 'too_short' END,
             CASE WHEN s.n > 90 THEN 'too_long' END,
             CASE WHEN s.chars * 10 < 40 * s.n
                    OR s.chars * 10 > 100 * s.n THEN 'word_len' END,
             CASE WHEN s.stop < 2 THEN 'stopwords' END,
             CASE WHEN COALESCE(m2.top2, 0) * 2 * 100 >= 20 * s.n
                  THEN 'repetition' END) AS reasons
         FROM s LEFT JOIN m2 ON s.doc_id = m2.doc_id)
       SELECT doc_id, n AS n_tokens, reasons, (reasons = '') AS kept
       FROM r"""

  /** q130: Gopher table A1's duplicate-line signals
    * (Repetition.dupLineProfile) — fraction of lines in a within-doc
    * duplicate group and fraction of characters they carry, the
    * line-grain complement of q97's n-gram profile. Pages synthesize
    * six lines per doc: an "item" pair (always duplicated), the doc's
    * text, a "sep" line duplicated only when doc_id % 4 == 0 (vs a
    * unique "only" line), and a unique "end" line — so dup_frac takes
    * two distinct values corpus-wide and the char fraction varies
    * continuously with text length. All-integer counts + one double
    * division per row, recomputed identically by the oracle. Scale
    * shape: explode → (doc,line) hash-agg → doc hash-agg, no window,
    * no cross-doc key. */
  val q130_dup_line_profile: Q = (s, d) => {
    val page = concat_ws("\n",
      concat(lit("item "), col("doc_id") % 5),
      col("text"),
      concat(lit("item "), col("doc_id") % 5),
      concat(lit("sep "), col("doc_id") % 3),
      when(col("doc_id") % 4 === 0,
        concat(lit("sep "), col("doc_id") % 3))
        .otherwise(concat(lit("only "), col("doc_id"))),
      concat(lit("end "), col("doc_id")))
    graft.operators.Repetition.dupLineProfile(
      Tables.documents(s, d).select(col("doc_id"), page.as("page")),
      "doc_id", "page")
  }

  val q130_dup_line_oracle: String =
    """WITH t AS (SELECT doc_id,
         string_split('item ' || (doc_id % 5) || chr(10) || text
           || chr(10) || 'item ' || (doc_id % 5) || chr(10)
           || 'sep ' || (doc_id % 3) || chr(10)
           || CASE WHEN doc_id % 4 = 0 THEN 'sep ' || (doc_id % 3)
                   ELSE 'only ' || doc_id END
           || chr(10) || 'end ' || doc_id, chr(10)) AS a
       FROM documents),
       l AS (SELECT doc_id, a[CAST(i AS INT)] AS line
         FROM t, unnest(range(1, len(a) + 1)) u(i)),
       g AS (SELECT doc_id, line, count(*) AS c
         FROM l GROUP BY doc_id, line),
       p AS (SELECT doc_id, c, c * length(line) AS chars,
           (c >= 2) AS dup FROM g)
       SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN dup THEN c ELSE 0 END) AS DOUBLE)
           / CAST(sum(c) AS DOUBLE) AS dup_frac,
         CASE WHEN sum(chars) = 0 THEN 0.0
           ELSE CAST(sum(CASE WHEN dup THEN chars ELSE 0 END) AS DOUBLE)
             / CAST(sum(chars) AS DOUBLE) END AS dup_char_frac
       FROM p GROUP BY doc_id"""

  /** q97: Gopher/MassiveText within-document repetition profile
    * (operators.Repetition.profile) — most-frequent 2-/3-gram token
    * fractions plus union coverage of duplicated 5-gram windows, the
    * template-junk thresholds every curation pass applies BEFORE any
    * cross-document dedup. No doc ever meets another doc: every signal
    * is explode + (doc,gram)-keyed hash aggs + one per-doc islands
    * window, all exact integer ratios, so the whole profile
    * hash-matches the SQL oracle. */
  val q97_gopher_repetition: Q = (s, d) =>
    graft.operators.Repetition.profile(
      Tables.documents(s, d), "doc_id", "text")

  val q97_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') a FROM documents),
       g2 AS (SELECT doc_id, array_to_string(a[i:i+1], ' ') gram
         FROM t, unnest(range(1, len(a))) u(i)),
       m2 AS (SELECT doc_id, max(c) AS top2 FROM (
           SELECT doc_id, gram, count(*) c FROM g2 GROUP BY doc_id, gram)
         GROUP BY doc_id),
       g3 AS (SELECT doc_id, array_to_string(a[i:i+2], ' ') gram
         FROM t, unnest(range(1, len(a) - 1)) u(i)),
       m3 AS (SELECT doc_id, max(c) AS top3 FROM (
           SELECT doc_id, gram, count(*) c FROM g3 GROUP BY doc_id, gram)
         GROUP BY doc_id),
       g5 AS (SELECT doc_id, CAST(u.i AS INT) AS pos,
           array_to_string(a[i:i+4], ' ') gram
         FROM t, unnest(range(1, greatest(len(a) - 3, 1))) u(i)),
       f AS (SELECT doc_id, pos FROM (
           SELECT doc_id, pos,
             count(*) OVER (PARTITION BY doc_id, gram) c FROM g5)
         WHERE c >= 2),
       b AS (SELECT doc_id, pos,
           CASE WHEN lag(pos) OVER w IS NULL
                  OR pos > lag(pos) OVER w + 4 THEN 1 ELSE 0 END AS brk
         FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       i AS (SELECT doc_id, pos, sum(brk) OVER
           (PARTITION BY doc_id ORDER BY pos) AS grp FROM b),
       cov AS (SELECT doc_id, sum(mx - mn + 5) AS covered FROM (
           SELECT doc_id, grp, min(pos) mn, max(pos) mx FROM i
           GROUP BY doc_id, grp) GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(t.a) AS BIGINT) AS n_tokens,
         CAST(COALESCE(m2.top2, 0) AS BIGINT) AS top2_count,
         COALESCE(CAST(m2.top2 * 2 AS DOUBLE) / len(t.a), 0.0)
           AS top2_frac,
         CAST(COALESCE(m3.top3, 0) AS BIGINT) AS top3_count,
         COALESCE(CAST(m3.top3 * 3 AS DOUBLE) / len(t.a), 0.0)
           AS top3_frac,
         COALESCE(CAST(cov.covered AS DOUBLE) / len(t.a), 0.0)
           AS dup5_cov
       FROM t LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
       LEFT JOIN cov USING (doc_id)"""

  /** q98: DSIR importance-resampling selection (operators.Dsir) — the
    * 25 documents whose hashed-bigram features look most like the
    * TARGET slice (here lang='en') relative to the raw corpus,
    * ln-ratio-weighted with add-one smoothing over 256 md5-hashed
    * buckets. The feature hash is engine-portable (conv(md5) in Spark
    * == CAST('0x…') in DuckDB), the log inputs are exact integer
    * ratios, and the gate surface is the id-tiebroken rank (q77/q94
    * ulp rule). */
  val q98_dsir_rank: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Dsir.topK(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), buckets = 256, k = 25)
  }

  val q98_oracle: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') a
         FROM documents),
       g AS (SELECT doc_id, lang, array_to_string(a[i:i+1], ' ') gram
         FROM t, unnest(range(1, len(a))) u(i)),
       bk AS (SELECT doc_id, lang,
           CAST(('0x' || substr(md5(gram), 1, 4)) AS INT) % 256 AS bucket
         FROM g),
       tc AS (SELECT bucket, count(*) ct FROM bk WHERE lang = 'en'
         GROUP BY bucket),
       rc AS (SELECT bucket, count(*) cr FROM bk GROUP BY bucket),
       tot AS (SELECT (SELECT sum(ct) FROM tc) AS nt,
                      (SELECT sum(cr) FROM rc) AS nr),
       w AS (SELECT rc.bucket,
           ln((COALESCE(tc.ct, 0) + 1.0) / (tot.nt + 256.0))
             - ln((rc.cr + 1.0) / (tot.nr + 256.0)) AS wt
         FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot),
       sc AS (SELECT bk.doc_id,
           round(sum(w.wt) / count(*), 9) AS weight
         FROM bk JOIN w USING (bucket) GROUP BY bk.doc_id)
       SELECT doc_id,
         CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS BIGINT)
           AS rk
       FROM sc ORDER BY weight DESC, doc_id LIMIT 25"""

  /** q101: incremental NEAR-dup detection
    * (operators.Dedup.incrementalNearDups) — MinHash-LSH pairs between
    * a new delivery (doc_id ≡ 0 mod 5) and the already-ingested corpus
    * (the rest), exact-jaccard reranked. The per-delivery dedup shape
    * of a continuously-fed lake: the corpus computes band hashes in
    * its scan and is NEVER shuffled — batch buckets broadcast in,
    * candidates reduce to an ids-only pair set, and a broadcast-pruned
    * rescan joins candidate shingle sets back. Same k=64/bands=32
    * LSH==exact identity band as q31/q96, so the gate oracles against
    * the exact cross-slice all-pairs jaccard. */
  val q101_incremental_neardup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Dedup.incrementalNearDups(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0),
      "text", "doc_id", n = 3, k = 64, bands = 32, minJaccard = 0.5)
  }

  val q101_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') toks
         FROM documents),
       sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+2], ' '))) shingles FROM t),
       ex AS (SELECT doc_id, len(shingles) nn, unnest(shingles) s FROM sh)
       SELECT a.doc_id AS id_b, b.doc_id AS id_c,
         CAST(count(*) AS BIGINT) AS common,
         CAST(any_value(a.nn) AS BIGINT) AS na,
         CAST(any_value(b.nn) AS BIGINT) AS nb,
         CAST(count(*) AS DOUBLE)
           / (any_value(a.nn) + any_value(b.nn) - count(*)) AS jac
       FROM ex a JOIN ex b ON a.s = b.s
         AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
       GROUP BY a.doc_id, b.doc_id
       HAVING CAST(count(*) AS DOUBLE)
           / (any_value(a.nn) + any_value(b.nn) - count(*)) >= 0.5"""

  /** q185: weighted sampling without replacement
    * ([[graft.operators.Sample.weightedTopN]], Efraimidis–Spirakis) —
    * select exactly 50 documents with inclusion probability scaling
    * with n_chars (the "prefer long/high-quality docs, exact sample
    * size" curation step per-stratum rates can't express). The
    * selection key ln(u)/w rides on a dyadic-rational uniform both
    * engines build bit-identically; the gate surface is the RANK
    * (id-tiebroken), the q77 rule for log-bearing scores — key gaps
    * on md5 uniforms are ~1/n relative, far above ulp noise
    * (SampleSpec asserts the gap at the cut). One stateless
    * projection + TakeOrderedAndProject: no corpus exchange. */
  val q185_weighted_sample: Q = (s, d) =>
    graft.operators.Sample.weightedTopN(
      Tables.documents(s, d), "doc_id", "n_chars", n = 50)

  val q185_oracle: String =
    """WITH k AS (SELECT doc_id,
         ln((2 * CAST(('0x' || substr(md5('wsamp:'
               || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
             / 8589934592.0) / n_chars AS key
       FROM documents WHERE n_chars > 0)
       SELECT doc_id, CAST(row_number()
           OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rk
       FROM k ORDER BY key DESC, doc_id LIMIT 50"""

  /** q186: exact composition matching
    * ([[graft.operators.Sample.matchComposition]]) — resample the
    * corpus onto a 4:2:2:1:1 language profile: k = min_b
    * floor(n_b/p_b) sets the scale (fr is the binding stratum at
    * every SF), each language keeps exactly k·p_b docs in salted-md5
    * hash order. Integer arithmetic end to end, so the gate
    * hash-matches; under the default window-group-limit threshold the
    * rank window prunes map-side (above it, the per-stratum sort is
    * exact-count selection's inherent cost — operator scaladoc). */
  val q186_match_composition: Q = (s, d) =>
    graft.operators.Sample.matchComposition(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      "lang", "doc_id",
      Seq(("en", 4L), ("fr", 2L), ("de", 2L), ("es", 1L), ("zh", 1L)))

  val q186_oracle: String =
    """WITH p(lang, share) AS (VALUES ('en', 4), ('fr', 2), ('de', 2),
         ('es', 1), ('zh', 1)),
       n AS (SELECT d.lang, count(*) AS nb, any_value(p.share) AS share
         FROM documents d JOIN p ON d.lang = p.lang GROUP BY d.lang),
       k AS (SELECT min(nb // share) AS k FROM n),
       lim AS (SELECT n.lang, k.k * n.share AS lim FROM n CROSS JOIN k),
       r AS (SELECT d.lang, d.doc_id,
           CAST(row_number() OVER (PARTITION BY d.lang
             ORDER BY md5('prof:' || CAST(d.doc_id AS VARCHAR)),
               d.doc_id) AS BIGINT) AS rank
         FROM documents d JOIN p ON d.lang = p.lang)
       SELECT r.lang, r.doc_id, r.rank
       FROM r JOIN lim ON r.lang = lim.lang
       WHERE r.rank <= lim.lim"""

  /** q188: water-filling token-budget allocation
    * ([[graft.operators.Allocate.waterFill]]) — split half the
    * corpus's total characters across the 20 sources proportionally
    * to md5-derived integer weights, capping each source at what it
    * has and re-flowing surplus (the mixing-plan step before
    * weightedMix / token-budget selection). The capped set is a
    * prefix of the scarcity order; every comparison and the final
    * floor division are exact long arithmetic, so the allocation
    * hash-matches; the oracle replays the identical prefix-sum
    * closed form. The allocation frame is 20 rows — the
    * unpartitioned windows run over a bounded model-sized frame by
    * contract, never a corpus. */
  val q188_budget_allocation: Q = (s, d) => {
    val avail = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).cast("long").as("avail"))
      .withColumn("weight",
        graft.functions.SketchFunctions.md5Prefix(
          concat(lit("wgt:"), col("source")), 2) % 8 + 1)
    val total = avail.agg(sum(col("avail"))).head().getLong(0)
    graft.operators.Allocate.waterFill(avail, "source", "avail",
      "weight", budget = total / 2)
  }

  val q188_oracle: String =
    """WITH a AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n,
         CAST((CAST(('0x' || substr(md5('wgt:' || source), 1, 2))
             AS BIGINT) % 8) + 1 AS BIGINT) AS w
       FROM documents GROUP BY source),
       b AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS budget,
         CAST(sum(w) AS BIGINT) AS tw FROM a),
       s AS (SELECT a.*, b.budget, b.tw,
           CAST(COALESCE(sum(n) OVER w2, 0) AS BIGINT) AS pn,
           CAST(COALESCE(sum(w) OVER w2, 0) AS BIGINT) AS pw,
           row_number() OVER (ORDER BY CAST(n AS DOUBLE) / w, source)
             AS pos
         FROM a CROSS JOIN b
         WINDOW w2 AS (ORDER BY CAST(n AS DOUBLE) / w, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       c AS (SELECT *, budget - pn AS brem, tw - pw AS wrem,
           (n * (tw - pw) <= (budget - pn) * w) AS capped FROM s),
       kk AS (SELECT min(pos) AS kpos FROM c WHERE NOT capped),
       kb AS (SELECT c.brem AS bk, c.wrem AS wk
         FROM c JOIN kk ON c.pos = kk.kpos)
       SELECT c.source, c.n AS avail, c.w AS weight,
         (kk.kpos IS NULL OR c.pos < kk.kpos) AS capped,
         CAST(CASE WHEN kk.kpos IS NULL OR c.pos < kk.kpos THEN c.n
              ELSE (kb.bk * c.w) // kb.wk END AS BIGINT) AS allocation
       FROM c LEFT JOIN kk ON true LEFT JOIN kb ON true"""

  /** The q189 taxonomy: multi-word phrases sharing prefixes/suffixes
    * ("agg" / "agg row" / "row scan") so the automaton's failure links
    * are load-bearing, plus high-frequency single words — the shape of
    * a real keyword dictionary. */
  private val q189_dict = Seq("agg", "agg row", "row scan",
    "scan slow", "spark quer", "hash join", "window agg",
    "data column", "join query", "stream big", "merge", "vector")

  /** q189: dictionary tagging ([[graft.operators.Tagger.tagDocs]]) —
    * every (document, matched phrase) pair for a 12-entry taxonomy,
    * matched in ONE Aho–Corasick corpus pass (native
    * [[graft.expressions.DictTags]]; per-row cost independent of
    * dictionary size — the big-fixed-dictionary complement to q147's
    * positional postings). Substring semantics == `contains`, which
    * is exactly what the oracle replays per dictionary entry. */
  val q189_dict_tags: Q = (s, d) =>
    graft.operators.Tagger.tagDocs(Tables.documents(s, d),
      "doc_id", "text", q189_dict)

  val q189_oracle: String = {
    val vals = q189_dict.zipWithIndex.map { case (p, i) =>
      s"(CAST($i AS BIGINT), '$p')" }.mkString(", ")
    s"""SELECT d.doc_id, t.tag_id, t.phrase
       FROM documents d
       JOIN (VALUES $vals) t(tag_id, phrase)
         ON contains(d.text, t.phrase)"""
  }

  /** q190: corpus drift / keyness report
    * ([[graft.operators.Drift.keynessTopK]], Dunning LLR) — the top-30
    * tokens most over-represented in the English slice vs the rest of
    * the corpus, by the G² log-likelihood ratio over each token's 2×2
    * contingency table. Every ln input is one double ratio of double
    * products of exact counts (bit-identical across engines); the
    * gate surface is the token-tiebroken RANK plus the exact counts
    * and the decimal-exact enrichment direction — raw G² never
    * crosses the gate (the q77 rule). The en/non-en split gives the
    * report real signal (language function words dominate the top). */
  val q190_keyness_drift: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Drift.keynessTopK(
      docs.filter(col("lang") === "en"),
      docs.filter(col("lang") =!= "en"), "text", k = 30)
  }

  val q190_oracle: String =
    """WITH at AS (SELECT unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE lang = 'en'),
       bt AS (SELECT unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE lang <> 'en'),
       ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS ca
         FROM at GROUP BY tok),
       cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS cb
         FROM bt GROUP BY tok),
       tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM at) AS ta,
         (SELECT CAST(count(*) AS BIGINT) FROM bt) AS tb),
       j AS (SELECT COALESCE(ca.tok, cb.tok) AS tok,
           COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb, ta, tb
         FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok CROSS JOIN tot),
       g AS (SELECT tok, ca, cb,
           CASE WHEN CAST(ca AS HUGEINT) * tb > CAST(cb AS HUGEINT) * ta
                THEN 'a' ELSE 'b' END AS direction,
           ((CASE WHEN ca = 0 THEN 0.0 ELSE CAST(ca AS DOUBLE)
               * ln((CAST(ca AS DOUBLE) * CAST(ta + tb AS DOUBLE))
                 / (CAST(ta AS DOUBLE) * CAST(ca + cb AS DOUBLE))) END)
            + (CASE WHEN cb = 0 THEN 0.0 ELSE CAST(cb AS DOUBLE)
               * ln((CAST(cb AS DOUBLE) * CAST(ta + tb AS DOUBLE))
                 / (CAST(tb AS DOUBLE) * CAST(ca + cb AS DOUBLE))) END)
            + (CASE WHEN ta - ca = 0 THEN 0.0 ELSE CAST(ta - ca AS DOUBLE)
               * ln((CAST(ta - ca AS DOUBLE) * CAST(ta + tb AS DOUBLE))
                 / (CAST(ta AS DOUBLE)
                    * CAST((ta + tb) - (ca + cb) AS DOUBLE))) END)
            + (CASE WHEN tb - cb = 0 THEN 0.0 ELSE CAST(tb - cb AS DOUBLE)
               * ln((CAST(tb - cb AS DOUBLE) * CAST(ta + tb AS DOUBLE))
                 / (CAST(tb AS DOUBLE)
                    * CAST((ta + tb) - (ca + cb) AS DOUBLE))) END))
           * 2.0 AS g2
         FROM j)
       SELECT CAST(row_number() OVER (ORDER BY g2 DESC, tok) AS BIGINT)
           AS rk, tok, ca, cb, direction
       FROM g ORDER BY g2 DESC, tok LIMIT 30"""

  /** q192: Kneser–Ney LM fluency ranking
    * ([[graft.operators.NgramLm.worstKKn]]) — the 25 least fluent
    * documents under the corpus's own interpolated-KN bigram LM
    * (D = 3/4), the production smoothing next to q94's Laplace
    * baseline. D = 3/4 keeps every probability a ratio of exact
    * integers: the ln input is t1 + t2 with each term one double
    * division of double products of exact counts, so both engines
    * build it bit-identically and the rank surface carries the gate
    * (boundary gaps spec-checked, the q94 argument). The oracle
    * replays the distinct-gram table, c(w1·)/N1+(w1·) stats,
    * continuation counts, and the interpolation formula. */
  val q192_kn_fluency: Q = (s, d) =>
    graft.operators.NgramLm.worstKKn(
      Tables.documents(s, d), "doc_id", "text", 25)

  val q192_oracle: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS a FROM documents),
       big AS (
         SELECT doc_id, unnest(list_transform(range(1, len(a)),
           i -> a[i] || ' ' || a[i + 1])) AS gram
         FROM t),
       bc AS (SELECT gram, CAST(count(*) AS BIGINT) AS c12
         FROM big GROUP BY gram),
       w1 AS (SELECT split_part(gram, ' ', 1) AS w1,
           CAST(sum(c12) AS BIGINT) AS c1,
           CAST(count(*) AS BIGINT) AS n1w
         FROM bc GROUP BY 1),
       w2 AS (SELECT split_part(gram, ' ', 2) AS w2,
           CAST(count(*) AS BIGINT) AS ncont
         FROM bc GROUP BY 1),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bc),
       sc AS (
         SELECT b.doc_id,
           sum(ln(CAST(greatest(4 * bc.c12 - 3, 0) AS DOUBLE)
               / CAST(4 * w1.c1 AS DOUBLE)
             + (3.0 * CAST(w1.n1w AS DOUBLE) * CAST(w2.ncont AS DOUBLE))
               / (CAST(4 * w1.c1 AS DOUBLE) * CAST(nb.nb AS DOUBLE))))
             / count(*) AS lp
         FROM big b
         JOIN bc USING (gram)
         JOIN w1 ON w1.w1 = split_part(b.gram, ' ', 1)
         JOIN w2 ON w2.w2 = split_part(b.gram, ' ', 2)
         CROSS JOIN nb
         GROUP BY b.doc_id)
       SELECT doc_id,
         CAST(row_number() OVER (ORDER BY lp ASC, doc_id) AS BIGINT)
           AS rk
       FROM sc ORDER BY lp ASC, doc_id LIMIT 25"""

  /** q194: dictionary SPAN extraction
    * ([[graft.operators.Tagger.tagSpans]]) — q189's taxonomy with
    * exact 1-based start offsets for EVERY occurrence (overlaps and
    * repeats included), the annotation/redaction surface. The oracle
    * brute-forces each entry's positions by substr equality over the
    * whole text — O(chars·|dict|), affordable at gate scale and
    * provably complete, against the automaton's single pass. */
  val q194_dict_spans: Q = (s, d) =>
    graft.operators.Tagger.tagSpans(Tables.documents(s, d),
      "doc_id", "text", q189_dict)

  val q194_oracle: String = {
    val vals = q189_dict.zipWithIndex.map { case (p, i) =>
      s"(CAST($i AS BIGINT), '$p')" }.mkString(", ")
    s"""SELECT d.doc_id, t.tag_id, CAST(u.i AS BIGINT) AS pos, t.phrase
       FROM documents d
       JOIN (VALUES $vals) t(tag_id, phrase) ON true,
       unnest(range(1, len(d.text) - len(t.phrase) + 2)) u(i)
       WHERE substr(d.text, CAST(u.i AS INT), len(t.phrase)) = t.phrase"""
  }

  /** q195: proximity span pairs
    * ([[graft.operators.Tagger.spanPairs]]) — every co-occurrence of
    * two DIFFERENT q189-taxonomy entries within 40 characters (start-
    * offset distance), per document: the relation-candidate surface
    * over q194's span list. The pairing runs INSIDE the row (array
    * higher-order functions over the one-pass automaton's output —
    * zero joins, zero exchanges); the oracle self-joins its brute-
    * forced span table, provably the same pair set. Exact integers
    * end to end → hash-exact gate. */
  val q195_span_pairs: Q = (s, d) =>
    graft.operators.Tagger.spanPairs(Tables.documents(s, d),
      "doc_id", "text", q189_dict, maxDist = 40)

  val q195_oracle: String = {
    val vals = q189_dict.zipWithIndex.map { case (p, i) =>
      s"(CAST($i AS BIGINT), '$p')" }.mkString(", ")
    s"""WITH sp AS (
         SELECT d.doc_id, t.tag_id, CAST(u.i AS BIGINT) AS pos,
           t.phrase
         FROM documents d
         JOIN (VALUES $vals) t(tag_id, phrase) ON true,
         unnest(range(1, len(d.text) - len(t.phrase) + 2)) u(i)
         WHERE substr(d.text, CAST(u.i AS INT), len(t.phrase))
             = t.phrase)
       SELECT a.doc_id, a.tag_id AS tag_a, a.pos AS pos_a,
         a.phrase AS phrase_a, b.tag_id AS tag_b, b.pos AS pos_b,
         b.phrase AS phrase_b
       FROM sp a JOIN sp b
         ON a.doc_id = b.doc_id AND a.tag_id < b.tag_id
        AND abs(a.pos - b.pos) <= 40"""
  }

  /** q196: PMI collocation mining
    * ([[graft.operators.Assoc.pmiTopK]]) — q157's co-occurrence
    * counts turned into association strength: top-40 token pairs by
    * lift = (n_xy·N)/(n_x·n_y) at support ≥ 5 (PMI = ln lift; ln is
    * monotonic so the lift ordering IS the PMI ordering and no ln is
    * ever computed). lift is one double division of double products
    * of exact longs — bit-identical cross-engine, so the value, the
    * cut, and the rank all gate hash-exact. */
  val q196_pmi_collocations: Q = (s, d) =>
    graft.operators.Assoc.pmiTopK(Tables.documents(s, d),
      "doc_id", "text", minSupport = 5L, k = 40)

  val q196_oracle: String =
    """WITH t AS (SELECT doc_id,
         list_distinct(string_split(text, ' ')) toks FROM documents),
       e AS (SELECT doc_id, unnest(toks) tk FROM t),
       p AS (SELECT a.tk AS x, b.tk AS y, CAST(count(*) AS BIGINT) AS n_xy
         FROM e a JOIN e b ON a.doc_id = b.doc_id AND a.tk < b.tk
         GROUP BY 1, 2 HAVING count(*) >= 5),
       df AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM e
         GROUP BY tk),
       n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       l AS (SELECT p.x, p.y, p.n_xy, dx.df AS n_x, dy.df AS n_y,
           (CAST(p.n_xy AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
             / (CAST(dx.df AS DOUBLE) * CAST(dy.df AS DOUBLE)) AS lift
         FROM p JOIN df dx ON dx.tk = p.x JOIN df dy ON dy.tk = p.y
         CROSS JOIN n)
       SELECT x, y, n_xy, n_x, n_y, lift,
         CAST(row_number() OVER (ORDER BY lift DESC, x, y) AS BIGINT)
           AS rk
       FROM l ORDER BY lift DESC, x, y LIMIT 40"""

  /** q198: trigram Kneser–Ney fluency ranking
    * ([[graft.operators.NgramLm.worstKKn3]], Chen & Goodman CL 1999
    * §4.1.6) — q192's production smoothing at the order real LMs
    * start at: worst-25 documents under the corpus's own interpolated
    * trigram KN, every lower-order stat a CONTINUATION count derived
    * from the one distinct-trigram table (what makes Σ_w3 P = 1 hold
    * level by level — spec-proven). D = 3/4 keeps every ln input a
    * fixed chain of correctly-rounded ops over exact integers; the
    * id-tiebroken rank gates (q77 rule). */
  val q198_kn3_fluency: Q = (s, d) =>
    graft.operators.NgramLm.worstKKn3(Tables.documents(s, d),
      "doc_id", "text", k = 25)

  val q198_oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a
         FROM documents),
       g AS (SELECT doc_id,
           array_to_string(list_slice(a, u.i, u.i + 2), ' ') AS gram
         FROM t, unnest(range(1, greatest(len(a) - 1, 1))) u(i)),
       tc AS (SELECT gram, CAST(count(*) AS BIGINT) AS c123
         FROM g GROUP BY gram),
       sp AS (SELECT gram, c123,
           split_part(gram, ' ', 1) AS w1, split_part(gram, ' ', 2) AS w2,
           split_part(gram, ' ', 3) AS w3 FROM tc),
       hist AS (SELECT w1 || ' ' || w2 AS h,
           CAST(sum(c123) AS BIGINT) AS c12dot,
           CAST(count(*) AS BIGINT) AS n1w12 FROM sp GROUP BY 1),
       bp AS (SELECT w2 AS bw2, w3 AS bw3,
           CAST(count(*) AS BIGINT) AS nc23 FROM sp GROUP BY 1, 2),
       mid AS (SELECT bw2, CAST(sum(nc23) AS BIGINT) AS nmid2,
           CAST(count(*) AS BIGINT) AS ntypes2 FROM bp GROUP BY 1),
       uni AS (SELECT bw3, CAST(count(*) AS BIGINT) AS ncont3
         FROM bp GROUP BY 1),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bp),
       gi AS (SELECT doc_id, gram, split_part(gram, ' ', 1) AS w1,
           split_part(gram, ' ', 2) AS w2, split_part(gram, ' ', 3) AS w3
         FROM g),
       j AS (SELECT gi.doc_id, tc.c123, h.c12dot, h.n1w12, b.nc23,
           m.nmid2, m.ntypes2, u.ncont3, nb.nb
         FROM gi
         LEFT JOIN tc ON tc.gram = gi.gram
         LEFT JOIN hist h ON h.h = gi.w1 || ' ' || gi.w2
         LEFT JOIN bp b ON b.bw2 = gi.w2 AND b.bw3 = gi.w3
         LEFT JOIN mid m ON m.bw2 = gi.w2
         LEFT JOIN uni u ON u.bw3 = gi.w3
         CROSS JOIN nb),
       j2 AS (SELECT *, CASE WHEN ncont3 IS NULL
             THEN 1.0 / CAST(4 * nb AS DOUBLE)
             ELSE CAST(ncont3 AS DOUBLE) / CAST(nb AS DOUBLE) END AS pu
         FROM j),
       j3 AS (SELECT *, CASE WHEN nmid2 IS NULL THEN pu
             ELSE (CASE WHEN nc23 IS NULL THEN 0.0
                   ELSE CAST(greatest(4 * nc23 - 3, 0) AS DOUBLE)
                     / CAST(4 * nmid2 AS DOUBLE) END)
               + (3.0 * CAST(ntypes2 AS DOUBLE) * pu)
                 / CAST(4 * nmid2 AS DOUBLE) END AS pbi
         FROM j2),
       j4 AS (SELECT doc_id, CASE WHEN c12dot IS NULL THEN pbi
             ELSE (CASE WHEN c123 IS NULL THEN 0.0
                   ELSE CAST(greatest(4 * c123 - 3, 0) AS DOUBLE)
                     / CAST(4 * c12dot AS DOUBLE) END)
               + (3.0 * CAST(n1w12 AS DOUBLE) * pbi)
                 / CAST(4 * c12dot AS DOUBLE) END AS pr
         FROM j3),
       sc AS (SELECT doc_id, sum(ln(pr)) / count(*) AS lp
         FROM j4 GROUP BY doc_id)
       SELECT doc_id,
         CAST(row_number() OVER (ORDER BY lp ASC, doc_id) AS BIGINT)
           AS rk
       FROM sc ORDER BY lp ASC, doc_id LIMIT 25"""

  /** q199: vocabulary-growth curve
    * ([[graft.operators.Drift.vocabGrowth]], Heaps' law) — token
    * instances and distinct token types seen after the first N
    * documents (ascending doc_id), N = 50..500 by 50: the
    * corpus-sizing report next to q178's frequency spectrum. Exact
    * integers end to end (first-seen rank ≤ N, never sampled) —
    * hash-exact; ranks ride the distributed PrefixSum, the only
    * unpartitioned state is the 10-row ladder. */
  val q199_vocab_growth: Q = (s, d) =>
    graft.operators.Drift.vocabGrowth(Tables.documents(s, d),
      "doc_id", "text", (1L to 10L).map(_ * 50L))

  val q199_oracle: String = {
    val vals = (1 to 10).map(i => s"(${i * 50})").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS a,
           row_number() OVER (ORDER BY doc_id) AS rk FROM documents),
       tok AS (SELECT rk, unnest(a) AS tk FROM d),
       fr AS (SELECT tk, min(rk) AS fr FROM tok GROUP BY tk),
       cp AS (SELECT * FROM (VALUES $vals) v(n))
       SELECT CAST(cp.n AS BIGINT) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM d WHERE d.rk <= cp.n)
           AS n_docs_seen,
         (SELECT CAST(coalesce(sum(len(a)), 0) AS BIGINT) FROM d
           WHERE d.rk <= cp.n) AS n_tokens,
         (SELECT CAST(count(*) AS BIGINT) FROM fr WHERE fr.fr <= cp.n)
           AS n_types
       FROM cp"""
  }

  /** q200: token dispersion report
    * ([[graft.operators.Drift.dispersionTopK]], Gries IJCL 2008) —
    * the 30 burstiest tokens (count ≥ 30) across SOURCES by the
    * deviation-of-proportions DP: high-frequency tokens that live in
    * one source are boilerplate, not vocabulary — what a raw
    * frequency stoplist misses. DP = A/(2CN) with A an exact
    * DECIMAL(38,0) sum of cross-products (absent parts in closed
    * form), one division — DP VALUES gate hash-exact. */
  val q200_dispersion: Q = (s, d) =>
    graft.operators.Drift.dispersionTopK(Tables.documents(s, d),
      "source", "text", minCount = 30L, k = 30)

  val q200_oracle: String =
    """WITH tp AS (SELECT source AS p,
         unnest(string_split(text, ' ')) AS tok FROM documents),
       c AS (SELECT p, tok, CAST(count(*) AS BIGINT) AS c
         FROM tp GROUP BY 1, 2),
       np AS (SELECT p, CAST(sum(c) AS BIGINT) AS np FROM c GROUP BY 1),
       ct AS (SELECT tok AS t2, CAST(sum(c) AS BIGINT) AS ct
         FROM c GROUP BY 1),
       n AS (SELECT CAST(sum(np) AS BIGINT) AS n FROM np),
       j AS (SELECT c.tok, ct.ct, n.n,
           sum(abs(CAST(c.c AS HUGEINT) * n.n
             - CAST(np.np AS HUGEINT) * ct.ct)) AS s1,
           CAST(sum(np.np) AS BIGINT) AS sn
         FROM c JOIN np USING (p) JOIN ct ON ct.t2 = c.tok
         CROSS JOIN n GROUP BY 1, 2, 3),
       a AS (SELECT tok, ct AS c,
           CAST(s1 + CAST(ct AS HUGEINT) * (n - sn) AS DOUBLE)
             / (2.0 * CAST(ct AS DOUBLE) * CAST(n AS DOUBLE)) AS dp
         FROM j WHERE ct >= 30)
       SELECT tok, c, dp,
         CAST(row_number() OVER (ORDER BY dp DESC, tok) AS BIGINT)
           AS rk
       FROM a ORDER BY dp DESC, tok LIMIT 30"""

  /** q201: language-ID quality audit via Cohen's kappa
    * ([[graft.operators.Labeling.cohenKappa]]) — chance-corrected
    * agreement between q35's heuristic language ID and the labeled
    * lang column: the label-QA number raw accuracy can't give on a
    * skewed language mix. po/pe/kappa are fixed chains of
    * correctly-rounded ops over exact integers (marginal products in
    * DECIMAL(38,0)) — all three VALUES gate hash-exact. */
  val q201_langid_kappa: Q = (s, d) =>
    graft.operators.Labeling.cohenKappa(
      q35_langid(s, d), "lang", "pred_lang")

  val q201_oracle: String =
    s"""WITH pred AS ($q35_oracle),
       base AS (SELECT lang, pred_lang FROM pred
         WHERE lang IS NOT NULL AND pred_lang IS NOT NULL),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
             AS BIGINT) AS agree FROM base),
       ma AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS na
         FROM base GROUP BY 1),
       mb AS (SELECT pred_lang AS c, CAST(count(*) AS BIGINT) AS nb
         FROM base GROUP BY 1),
       s AS (SELECT coalesce(sum(CAST(ma.na AS HUGEINT) * mb.nb), 0)
           AS s FROM ma JOIN mb USING (c)),
       k0 AS (SELECT nn.n, nn.agree,
           CAST(nn.agree AS DOUBLE) / CAST(nn.n AS DOUBLE) AS po,
           CAST(s.s AS DOUBLE)
             / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS pe
         FROM nn CROSS JOIN s)
       SELECT n AS n_items, agree AS n_agree, po, pe,
         CASE WHEN pe = 1.0 THEN NULL
           ELSE (po - pe) / (1.0 - pe) END AS kappa
       FROM k0"""

  /** q202: per-source lexical diversity
    * ([[graft.operators.Drift.lexicalDiversity]]) — token/type
    * counts, type-token ratio, and Simpson's repeated-token
    * probability per source: the template/boilerplate screen. Exact
    * integer numerators, DECIMAL(38,0) sums, one division each —
    * ttr and simpson VALUES gate hash-exact. */
  val q202_lexical_diversity: Q = (s, d) =>
    graft.operators.Drift.lexicalDiversity(Tables.documents(s, d),
      "source", "text")

  val q202_oracle: String =
    """WITH tp AS (SELECT source AS part,
         unnest(string_split(text, ' ')) AS tok FROM documents),
       c AS (SELECT part, tok, CAST(count(*) AS BIGINT) AS c
         FROM tp GROUP BY 1, 2),
       a AS (SELECT part, CAST(sum(c) AS BIGINT) AS nt,
           CAST(count(*) AS BIGINT) AS tv,
           sum(CAST(c AS HUGEINT) * (c - 1)) AS pairs
         FROM c GROUP BY 1)
       SELECT part, nt AS n_tokens, tv AS n_types,
         CAST(tv AS DOUBLE) / CAST(nt AS DOUBLE) AS ttr,
         CASE WHEN nt < 2 THEN NULL
           ELSE CAST(pairs AS DOUBLE)
             / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE)
         END AS simpson
       FROM a"""

  /** q204: isotonic probability calibration
    * ([[graft.operators.Calibrate.isotonicFit]] scaladoc — PAV via
    * the Robertson-Wright-Dykstra minimax closed form, so a SQL
    * oracle replays the whole fit with two running-extreme windows
    * over the O(B²) interval-mean table). The fixture bins documents
    * by length (n_chars div 50) and draws a salted-md5 label whose
    * true rate RISES with length — empirical bin rates wiggle
    * non-monotonically at both gate SFs (measured: three adjacent
    * inversions at sf0.01), so the gate exercises real pooling, not a
    * pass-through. Every interval mean is one correctly-rounded
    * double division of exact longs (the q183 rule), so rate VALUES
    * gate hash-exact. */
  val q204_isotonic_calibration: Q = (s, d) => {
    val labeled = Tables.documents(s, d).select(
      expr("n_chars div 50").as("score"),
      (graft.functions.SketchFunctions.md5Prefix(
          concat(lit("cal:"), col("doc_id").cast("string")), 8)
        < col("n_chars") * lit(7158278L)).cast("int").as("label"))
    graft.operators.Calibrate.isotonicFit(labeled, "score", "label")
  }

  val q204_oracle: String =
    """WITH b AS (SELECT n_chars // 50 AS score,
         CASE WHEN CAST(('0x' || substr(md5('cal:' ||
                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              < n_chars * 7158278
           THEN 1 ELSE 0 END AS label
       FROM documents),
     bins AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS pos
       FROM b GROUP BY score),
     cum AS (SELECT score, n, pos,
         row_number() OVER (ORDER BY score) AS k,
         sum(n) OVER (ORDER BY score) AS cn,
         sum(pos) OVER (ORDER BY score) AS cp
       FROM bins),
     means AS (SELECT lo.k AS i, hi.k AS j,
         CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
           / CAST(hi.cn - lo.cn + lo.n AS DOUBLE) AS m
       FROM cum lo JOIN cum hi ON lo.k <= hi.k),
     g AS (SELECT i AS k, j,
         max(m) OVER (PARTITION BY j ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       FROM means),
     fit AS (SELECT k, g AS rate FROM (
         SELECT k, j, min(g) OVER (PARTITION BY k ORDER BY j DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         FROM g) WHERE j = k)
     SELECT c.score, c.n, c.pos, f.rate
     FROM cum c JOIN fit f ON f.k = c.k"""

  /** q209: PER-LANGUAGE isotonic calibration
    * ([[graft.operators.Calibrate.isotonicFitGrouped]] — one
    * independent PAV curve per language, the shape a real calibration
    * pass takes when score distributions shift across strata; q204's
    * single-curve fixture, partitioned). Same minimax replay in the
    * oracle with every window PARTITION BY lang and a null-safe group
    * join (the q183 null-stratum contract). Wider bins (div 100) keep
    * per-language frames small while still inverting at both SFs. */
  val q209_grouped_calibration: Q = (s, d) => {
    val labeled = Tables.documents(s, d).select(
      col("lang"),
      expr("n_chars div 100").as("score"),
      (graft.functions.SketchFunctions.md5Prefix(
          concat(lit("cal:"), col("doc_id").cast("string")), 8)
        < col("n_chars") * lit(7158278L)).cast("int").as("label"))
    graft.operators.Calibrate.isotonicFitGrouped(labeled, "lang",
      "score", "label")
  }

  val q209_oracle: String =
    """WITH b AS (SELECT lang, n_chars // 100 AS score,
         CASE WHEN CAST(('0x' || substr(md5('cal:' ||
                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              < n_chars * 7158278
           THEN 1 ELSE 0 END AS label
       FROM documents),
     bins AS (SELECT lang, score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS pos
       FROM b GROUP BY lang, score),
     cum AS (SELECT lang, score, n, pos,
         row_number() OVER (PARTITION BY lang ORDER BY score) AS k,
         sum(n) OVER (PARTITION BY lang ORDER BY score) AS cn,
         sum(pos) OVER (PARTITION BY lang ORDER BY score) AS cp
       FROM bins),
     means AS (SELECT lo.lang, lo.k AS i, hi.k AS j,
         CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
           / CAST(hi.cn - lo.cn + lo.n AS DOUBLE) AS m
       FROM cum lo JOIN cum hi
         ON lo.lang IS NOT DISTINCT FROM hi.lang AND lo.k <= hi.k),
     g AS (SELECT lang, i AS k, j,
         max(m) OVER (PARTITION BY lang, j ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       FROM means),
     fit AS (SELECT lang, k, g AS rate FROM (
         SELECT lang, k, j, min(g) OVER (PARTITION BY lang, k
           ORDER BY j DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         FROM g) WHERE j = k)
     SELECT c.lang, c.score, c.n, c.pos, f.rate
     FROM cum c JOIN fit f
       ON f.lang IS NOT DISTINCT FROM c.lang AND f.k = c.k"""

  /** q211: Kolmogorov–Smirnov numeric drift ([[graft.operators.Stats
    * .ksTest]] scaladoc — exact 128-bit CDF-difference numerator, the
    * rejection a sqrt-chain of correctly-rounded IEEE ops). Two
    * comparisons of doc-length distributions between source halves:
    * the NULL comparison (same generator → measured D = 0.048/0.056,
    * no reject at either SF) and a PLANTED +60-char shift (D =
    * 0.16/0.152 > crit 0.1215 → reject at both SFs) — so the
    * rejection decision genuinely splits within one gate. */
  val q211_ks_drift: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val half = (lo: Boolean) => docs.filter(
      if (lo) expr("cast(substring(source, 4) as int) < 10")
      else expr("cast(substring(source, 4) as int) >= 10"))
    val a = half(true).select(col("n_chars"))
    val b = half(false).select(col("n_chars"))
    val bShift = half(false).select((col("n_chars") + 60).as("n_chars"))
    graft.operators.Stats.ksTest(a, b, "n_chars")
      .withColumn("cmp", lit("null"))
      .unionByName(graft.operators.Stats.ksTest(a, bShift, "n_chars")
        .withColumn("cmp", lit("shift60")))
      .select(col("cmp"), col("n"), col("m"), col("d_num"), col("d"),
        col("reject"))
  }

  val q211_oracle: String =
    """WITH src AS (SELECT CAST(substr(source, 4) AS INT) AS s,
         n_chars FROM documents),
     a AS (SELECT n_chars AS v FROM src WHERE s < 10),
     b0 AS (SELECT n_chars AS v FROM src WHERE s >= 10),
     b1 AS (SELECT n_chars + 60 AS v FROM src WHERE s >= 10),
     ks0 AS (
       SELECT 'null' AS cmp, * FROM (
         WITH ca AS (SELECT v, count(*) c FROM a GROUP BY v),
           cb AS (SELECT v, count(*) c FROM b0 GROUP BY v),
           mg AS (SELECT coalesce(ca.v, cb.v) v, coalesce(ca.c, 0) na,
               coalesce(cb.c, 0) nb
             FROM ca FULL JOIN cb ON ca.v = cb.v),
           tot AS (SELECT CAST(sum(na) AS BIGINT) n,
               CAST(sum(nb) AS BIGINT) m FROM mg),
           cm AS (SELECT sum(na) OVER (ORDER BY v) cna,
               sum(nb) OVER (ORDER BY v) cnb FROM mg)
         SELECT tot.n, tot.m,
           CAST(max(abs(CAST(cna AS HUGEINT) * tot.m
             - CAST(cnb AS HUGEINT) * tot.n)) AS DOUBLE) AS d_num
         FROM cm CROSS JOIN tot GROUP BY tot.n, tot.m)),
     ks1 AS (
       SELECT 'shift60' AS cmp, * FROM (
         WITH ca AS (SELECT v, count(*) c FROM a GROUP BY v),
           cb AS (SELECT v, count(*) c FROM b1 GROUP BY v),
           mg AS (SELECT coalesce(ca.v, cb.v) v, coalesce(ca.c, 0) na,
               coalesce(cb.c, 0) nb
             FROM ca FULL JOIN cb ON ca.v = cb.v),
           tot AS (SELECT CAST(sum(na) AS BIGINT) n,
               CAST(sum(nb) AS BIGINT) m FROM mg),
           cm AS (SELECT sum(na) OVER (ORDER BY v) cna,
               sum(nb) OVER (ORDER BY v) cnb FROM mg)
         SELECT tot.n, tot.m,
           CAST(max(abs(CAST(cna AS HUGEINT) * tot.m
             - CAST(cnb AS HUGEINT) * tot.n)) AS DOUBLE) AS d_num
         FROM cm CROSS JOIN tot GROUP BY tot.n, tot.m)),
     u AS (SELECT * FROM ks0 UNION ALL SELECT * FROM ks1)
     SELECT cmp, n, m, d_num,
       d_num / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS d,
       d_num / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) >
         1.358 * sqrt(CAST(n + m AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))) AS reject
     FROM u"""

  /** q212: mix-concentration report ([[graft.operators.Stats
    * .giniConcentration]] scaladoc — weighted Gini with PrefixSum
    * ranks and a decimal(38) rank·weight sum, one correctly-rounded
    * division at the end). Two axes in one gate: language
    * concentration by document count (measured 0.20/0.25 across SFs —
    * the corpus is genuinely skewed) and source concentration by
    * character mass (0.05 — near-even by construction), so the
    * statistic is exercised at both ends of its range. */
  val q212_gini_mix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Stats.giniConcentration(
        docs.select(col("lang").as("k"), lit(1L).as("w")), "k", "w")
      .withColumn("axis", lit("lang_docs"))
      .unionByName(graft.operators.Stats.giniConcentration(
          docs.select(col("source").as("k"), col("n_chars").as("w")),
          "k", "w")
        .withColumn("axis", lit("source_chars")))
      .select(col("axis"), col("n_items"), col("total"), col("gini"))
  }

  val q212_oracle: String =
    """WITH lang_b AS (SELECT lang AS k, CAST(count(*) AS BIGINT) AS w
         FROM documents GROUP BY 1),
     src_b AS (SELECT source AS k, CAST(sum(n_chars) AS BIGINT) AS w
         FROM documents GROUP BY 1),
     lang_r AS (SELECT w, row_number()
         OVER (ORDER BY w, k NULLS FIRST) AS i
       FROM lang_b),
     src_r AS (SELECT w, row_number()
         OVER (ORDER BY w, k NULLS FIRST) AS i
       FROM src_b),
     lang_a AS (SELECT 'lang_docs' AS axis,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(w) AS BIGINT) AS total,
         sum(CAST(i AS HUGEINT) * w) AS sw
       FROM lang_r),
     src_a AS (SELECT 'source_chars' AS axis,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(w) AS BIGINT) AS total,
         sum(CAST(i AS HUGEINT) * w) AS sw
       FROM src_r),
     u AS (SELECT * FROM lang_a UNION ALL SELECT * FROM src_a)
     SELECT axis, n_items, total,
       CASE WHEN total > 0 THEN
         CAST(2 * sw - CAST(n_items + 1 AS HUGEINT) * total AS DOUBLE)
           / CAST(CAST(n_items AS HUGEINT) * total AS DOUBLE)
       END AS gini
     FROM u"""

  /** q213: per-language KS drift matrix ([[graft.operators.Stats
    * .ksTestGrouped]] scaladoc — one KS test per stratum in a single
    * pass, running CDFs on group-partitioned windows instead of the
    * global PrefixSum). The fixture plants a +200-char shift in ONE
    * language's second half (fr): fr rejects at both SFs (D = 0.62 /
    * 0.56 over crit ≈ 0.31) and every other language does not — the
    * per-group decision is load-bearing row by row. */
  val q213_ks_by_lang: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val a = docs.filter(expr("cast(substring(source, 4) as int) < 10"))
      .select(col("lang"), col("n_chars"))
    val b = docs.filter(expr("cast(substring(source, 4) as int) >= 10"))
      .select(col("lang"),
        when(col("lang") === "fr", col("n_chars") + 200)
          .otherwise(col("n_chars")).as("n_chars"))
    graft.operators.Stats.ksTestGrouped(a, b, "lang", "n_chars")
  }

  val q213_oracle: String =
    """WITH src AS (SELECT lang, CAST(substr(source, 4) AS INT) AS s,
         n_chars FROM documents),
     a AS (SELECT lang AS g, n_chars AS v FROM src WHERE s < 10),
     b AS (SELECT lang AS g,
         CASE WHEN lang = 'fr' THEN n_chars + 200 ELSE n_chars END AS v
       FROM src WHERE s >= 10),
     ca AS (SELECT g, v, count(*) c FROM a GROUP BY 1, 2),
     cb AS (SELECT g, v, count(*) c FROM b GROUP BY 1, 2),
     mg AS (SELECT coalesce(ca.g, cb.g) g, coalesce(ca.v, cb.v) v,
         coalesce(ca.c, 0) na, coalesce(cb.c, 0) nb
       FROM ca FULL JOIN cb
         ON ca.g IS NOT DISTINCT FROM cb.g AND ca.v = cb.v),
     st AS (SELECT g,
         sum(na) OVER (PARTITION BY g ORDER BY v) cna,
         sum(nb) OVER (PARTITION BY g ORDER BY v) cnb,
         sum(na) OVER (PARTITION BY g) n,
         sum(nb) OVER (PARTITION BY g) m
       FROM mg),
     agg AS (SELECT g AS lang, CAST(max(n) AS BIGINT) n,
         CAST(max(m) AS BIGINT) m,
         CAST(max(abs(CAST(cna AS HUGEINT) * m
           - CAST(cnb AS HUGEINT) * n)) AS DOUBLE) AS d_num
       FROM st GROUP BY g)
     SELECT lang, n, m, d_num,
       d_num / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS d,
       d_num / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) >
         1.358 * sqrt(CAST(n + m AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE))) AS reject
     FROM agg"""

  /** q214: calibration SERVING ([[graft.operators.Calibrate.applyFit]]
    * scaladoc — the q204 fit collected as a model-sized array literal
    * and applied as a stateless step-function projection: zero joins,
    * zero shuffles). The applied scores use a DIFFERENT binning
    * (div 37 vs the fit's div 50), so the gate exercises floor
    * lookups between fitted bins and the upper clamp (applied scores
    * reach 14 vs fit max 11); the oracle replays the whole q204
    * minimax fit and an ORDER BY score DESC LIMIT 1 correlated
    * lookup per document. */
  val q214_calibration_apply: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val labeled = docs.select(
      expr("n_chars div 50").as("score"),
      (graft.functions.SketchFunctions.md5Prefix(
          concat(lit("cal:"), col("doc_id").cast("string")), 8)
        < col("n_chars") * lit(7158278L)).cast("int").as("label"))
    val fit = graft.operators.Calibrate.isotonicFit(labeled, "score",
      "label")
    graft.operators.Calibrate.applyFit(
      docs.select(col("doc_id"), expr("n_chars div 37").as("score")),
      fit, "score")
  }

  val q214_oracle: String =
    """WITH b AS (SELECT n_chars // 50 AS score,
         CASE WHEN CAST(('0x' || substr(md5('cal:' ||
                CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              < n_chars * 7158278
           THEN 1 ELSE 0 END AS label
       FROM documents),
     bins AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS pos
       FROM b GROUP BY score),
     cum AS (SELECT score, n, pos,
         row_number() OVER (ORDER BY score) AS k,
         sum(n) OVER (ORDER BY score) AS cn,
         sum(pos) OVER (ORDER BY score) AS cp
       FROM bins),
     means AS (SELECT lo.k AS i, hi.k AS j,
         CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
           / CAST(hi.cn - lo.cn + lo.n AS DOUBLE) AS m
       FROM cum lo JOIN cum hi ON lo.k <= hi.k),
     g AS (SELECT i AS k, j,
         max(m) OVER (PARTITION BY j ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       FROM means),
     ft AS (SELECT c.score, f.rate FROM cum c JOIN (
         SELECT k, g AS rate FROM (
           SELECT k, j, min(g) OVER (PARTITION BY k ORDER BY j DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
           FROM g) WHERE j = k) f ON f.k = c.k),
     scored AS (SELECT doc_id, n_chars // 37 AS score FROM documents)
     SELECT sc.doc_id, sc.score,
       CASE WHEN sc.score IS NULL THEN NULL ELSE coalesce(
         (SELECT f.rate FROM ft f WHERE f.score <= sc.score
          ORDER BY f.score DESC LIMIT 1),
         (SELECT f.rate FROM ft f ORDER BY f.score LIMIT 1))
       END AS calibrated
     FROM scored sc"""

  /** q219: split-conformal threshold per language
    * ([[graft.operators.Calibrate.conformalThreshold]] scaladoc — the
    * distribution-free ≤α exceedance guarantee): per lang, the
    * calibration quantile of n_chars at α = 1/5, i.e. the
    * ⌈(n+1)·4/5⌉-th smallest length. qhat is an ORDER STATISTIC (an
    * actual row value under a (score, doc_id) sort), so the gate is
    * exact in any engine — the quantileProfile rule. */
  val q219_conformal_threshold: Q = (s, d) =>
    graft.operators.Calibrate.conformalThreshold(Tables.documents(s, d),
      "lang", "n_chars", "doc_id", alphaNum = 1, alphaDen = 5)

  val q219_oracle: String =
    """WITH r AS (SELECT lang AS grp, n_chars AS v,
         row_number() OVER (PARTITION BY lang
           ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
       FROM documents WHERE n_chars IS NOT NULL)
       SELECT grp, CAST(max(n) AS BIGINT) AS n,
         max(CASE WHEN rn = ((n + 1) * 4 + 4) // 5 THEN v END) AS qhat
       FROM r GROUP BY grp"""

  /** q220: Fleiss' kappa over a 3-rater panel
    * ([[graft.operators.Labeling.fleissKappa]] scaladoc — κ as ONE
    * division of two exact 128-bit integers). The panel is the q201
    * synthesized-rater discipline taken to three raters: the labeled
    * lang column ("gold") plus two md5-corrupted heuristic raters
    * (15% / 25% deterministic error to distinct junk categories), so
    * agreement is high but imperfect and every κ input is
    * SQL-replayable. pbar/pe/kappa all gate hash-exact. */
  val q220_fleiss_kappa: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def h(salt: String) =
      graft.functions.SketchFunctions.md5Prefix(
        concat(lit(salt), col("doc_id").cast("string")), 8)
    val votes = docs.select(col("doc_id"), lit("gold").as("rater"),
        col("lang").as("label"))
      .unionByName(docs.select(col("doc_id"), lit("h1").as("rater"),
        when(h("r1:") % 20 < 3, lit("zz")).otherwise(col("lang"))
          .as("label")))
      .unionByName(docs.select(col("doc_id"), lit("h2").as("rater"),
        when(h("r2:") % 20 < 5, lit("yy")).otherwise(col("lang"))
          .as("label")))
    graft.operators.Labeling.fleissKappa(votes, "doc_id", "rater",
      "label")
  }

  val q220_oracle: String =
    """WITH votes AS (
         SELECT doc_id, 'gold' AS rater, lang AS label FROM documents
         UNION ALL
         SELECT doc_id, 'h1',
           CASE WHEN CAST(('0x' || substr(md5('r1:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 20 < 3
             THEN 'zz' ELSE lang END
         FROM documents
         UNION ALL
         SELECT doc_id, 'h2',
           CASE WHEN CAST(('0x' || substr(md5('r2:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 20 < 5
             THEN 'yy' ELSE lang END
         FROM documents),
       m AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS m
         FROM votes GROUP BY 1, 2),
       pi AS (SELECT doc_id, CAST(sum(m * m) AS BIGINT) AS m2
         FROM m GROUP BY 1),
       it AS (SELECT CAST(count(*) AS BIGINT) AS ni,
           CAST(sum(m2) AS BIGINT) AS sm2 FROM pi),
       ct AS (SELECT sum(CAST(tc AS HUGEINT) * tc) AS c2 FROM (
           SELECT CAST(sum(m) AS BIGINT) AS tc FROM m GROUP BY label)),
       k0 AS (SELECT ni,
           CAST(sm2 - ni * 3 AS HUGEINT) AS a,
           CAST(ni * 6 AS HUGEINT) AS b,
           CAST(ni * 3 AS HUGEINT) * CAST(ni * 3 AS HUGEINT) AS dd,
           c2
         FROM it CROSS JOIN ct)
       SELECT ni AS n_items, CAST(3 AS BIGINT) AS n_raters,
         CAST(a AS DOUBLE) / CAST(b AS DOUBLE) AS pbar,
         CAST(c2 AS DOUBLE) / CAST(dd AS DOUBLE) AS pe,
         CASE WHEN b * dd - c2 * b = 0 THEN NULL
           ELSE CAST(a * dd - c2 * b AS DOUBLE)
             / CAST(b * dd - c2 * b AS DOUBLE) END AS kappa
       FROM k0"""

  /** q221: rank-biased overlap of two quality-signal rankings
    * ([[graft.operators.Fusion.rboTopK]], Webber et al. TOIS 2010) —
    * per language, how much the char-length and token-count top-10s
    * agree, weighted toward the top (the "which filter signal to
    * trust" screen; Kendall over a top-k treats a swap at rank 1 and
    * rank 10 the same, RBO discounts geometrically). p = 9/10,
    * depth 10; the weight table is exact longs over den = 7·10¹¹, so
    * rbo_num gates as an exact integer and rbo is one double
    * division. Measured 0.40–0.61 across languages at both SFs —
    * agreement is real but far from identity, so the statistic is
    * load-bearing in both directions. */
  val q221_rbo_signals: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val byChars = docs.select(col("lang"), col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))).as("rk"))
    val byTokens = docs.select(col("lang"), col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(size(split(col("text"), " ")), col("doc_id")))
        .as("rk"))
    graft.operators.Fusion.rboTopK(byChars, byTokens, "lang",
      "doc_id", "rk", pNum = 9, pDen = 10, depth = 10)
  }

  val q221_oracle: String =
    """WITH ra AS (SELECT lang AS grp, doc_id AS item,
         row_number() OVER (PARTITION BY lang
           ORDER BY n_chars NULLS FIRST, doc_id NULLS FIRST) AS r
       FROM documents),
       rb AS (SELECT lang AS grp, doc_id AS item,
         row_number() OVER (PARTITION BY lang
           ORDER BY len(string_split(text, ' ')) NULLS FIRST,
             doc_id NULLS FIRST) AS r
       FROM documents),
       j AS (SELECT ra.grp, greatest(ra.r, rb.r) AS m
         FROM ra JOIN rb ON ra.grp = rb.grp AND ra.item = rb.item
         WHERE ra.r <= 10 AND rb.r <= 10)
       SELECT grp, count(*) AS n_common,
         CAST(sum(CASE m
           WHEN 1 THEN 164791479598 WHEN 2 THEN 94791479598
           WHEN 3 THEN 63291479598 WHEN 4 THEN 44391479598
           WHEN 5 THEN 31633979598 WHEN 6 THEN 22448579598
           WHEN 7 THEN 15559529598 WHEN 8 THEN 10245119598
           WHEN 9 THEN 6060021723 WHEN 10 THEN 2711943423
           END) AS BIGINT) AS rbo_num,
         CAST(sum(CASE m
           WHEN 1 THEN 164791479598 WHEN 2 THEN 94791479598
           WHEN 3 THEN 63291479598 WHEN 4 THEN 44391479598
           WHEN 5 THEN 31633979598 WHEN 6 THEN 22448579598
           WHEN 7 THEN 15559529598 WHEN 8 THEN 10245119598
           WHEN 9 THEN 6060021723 WHEN 10 THEN 2711943423
           END) AS BIGINT) / 700000000000.0 AS rbo
       FROM j GROUP BY grp"""

  /** q222: sampling-quota apportionment
    * ([[graft.operators.Allocate.apportion]] — Hamilton largest
    * remainder): a 1000-slot sampling plan across (lang, source)
    * strata proportional to character mass, rounded to whole slots
    * with zero drift (Σ slots == 1000 exactly, no stratum off its
    * real-valued quota by ≥ 1). decimal(38) products, integral div,
    * full-key remainder tie-break — all integer, hash-exact. */
  val q222_sample_quotas: Q = (s, d) =>
    graft.operators.Allocate.apportion(Tables.documents(s, d),
      Seq("lang", "source"), "n_chars", total = 1000L)

  val q222_oracle: String =
    """WITH w AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS w
         FROM documents GROUP BY 1, 2 HAVING sum(n_chars) > 0),
       t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM w),
       b AS (SELECT lang, source, w,
           CAST((1000 * CAST(w AS HUGEINT)) // tot AS BIGINT) AS base,
           CAST(1000 * CAST(w AS HUGEINT)
             - ((1000 * CAST(w AS HUGEINT)) // tot) * tot AS BIGINT)
             AS rem
         FROM w CROSS JOIN t),
       r AS (SELECT *,
           row_number() OVER (ORDER BY rem DESC,
             lang NULLS FIRST, source NULLS FIRST) AS rr,
           CAST(1000 - sum(base) OVER () AS BIGINT) AS leftover
         FROM b)
       SELECT lang, source, w,
         base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS slots
       FROM r"""

  /** q223: Krippendorff's alpha over a RAGGED 3-rater panel
    * ([[graft.operators.Labeling.krippendorffAlpha]] — the agreement
    * statistic for exactly the missing-ratings panels q220's Fleiss
    * refuses): the q220 raters with a deterministic ~20% per-vote
    * md5 dropout, so items carry 0–3 ratings (sub-2 items drop as
    * unpairable; the observed per-item counts make L = lcm{1,2} = 2,
    * which the oracle replays). α is ONE division of two exact
    * 128-bit integers; do/de are single exact-integer divisions —
    * all three gate hash-exact. */
  val q223_krippendorff_alpha: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def h(salt: String) =
      graft.functions.SketchFunctions.md5Prefix(
        concat(lit(salt), col("doc_id").cast("string")), 8)
    def keep(salt: String) = h(salt) % 10 >= 2
    val votes = docs.filter(keep("dg:"))
      .select(col("doc_id"), lit("gold").as("rater"),
        col("lang").as("label"))
      .unionByName(docs.filter(keep("d1:"))
        .select(col("doc_id"), lit("h1").as("rater"),
          when(h("r1:") % 20 < 3, lit("zz")).otherwise(col("lang"))
            .as("label")))
      .unionByName(docs.filter(keep("d2:"))
        .select(col("doc_id"), lit("h2").as("rater"),
          when(h("r2:") % 20 < 5, lit("yy")).otherwise(col("lang"))
            .as("label")))
    graft.operators.Labeling.krippendorffAlpha(votes, "doc_id",
      "rater", "label")
  }

  val q223_oracle: String =
    """WITH votes AS (
         SELECT doc_id, 'gold' AS rater, lang AS label FROM documents
         WHERE CAST(('0x' || substr(md5('dg:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2
         UNION ALL
         SELECT doc_id, 'h1',
           CASE WHEN CAST(('0x' || substr(md5('r1:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 20 < 3
             THEN 'zz' ELSE lang END
         FROM documents
         WHERE CAST(('0x' || substr(md5('d1:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2
         UNION ALL
         SELECT doc_id, 'h2',
           CASE WHEN CAST(('0x' || substr(md5('r2:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 20 < 5
             THEN 'yy' ELSE lang END
         FROM documents
         WHERE CAST(('0x' || substr(md5('d2:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2),
       o AS (SELECT doc_id, label, CAST(count(*) AS BIGINT) AS o
         FROM votes GROUP BY 1, 2),
       om AS (SELECT doc_id, label, o,
           CAST(sum(o) OVER (PARTITION BY doc_id) AS BIGINT) AS m
         FROM o),
       p AS (SELECT * FROM om WHERE m >= 2),
       pi AS (SELECT doc_id, m,
           CAST(sum(o * (m - o)) AS BIGINT) AS u0
         FROM p GROUP BY 1, 2),
       it AS (SELECT CAST(count(*) AS BIGINT) AS ni,
           CAST(sum(m) AS BIGINT) AS n,
           sum(CAST(2 // (m - 1) AS HUGEINT) * u0) AS uu FROM pi),
       mg AS (SELECT sum(CAST(nc AS HUGEINT) * nc) AS s2 FROM (
           SELECT CAST(sum(o) AS BIGINT) AS nc FROM p GROUP BY label)),
       k0 AS (SELECT ni, n, uu,
           CAST(n AS HUGEINT) * n - s2 AS de_num
         FROM it CROSS JOIN mg)
       SELECT n AS n_ratings, ni AS n_items,
         CAST(uu AS DOUBLE) / CAST(2 * n AS DOUBLE) AS "do",
         CAST(de_num AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS de,
         CASE WHEN de_num = 0 THEN NULL
           ELSE CAST(2 * de_num - uu * (n - 1) AS DOUBLE)
             / CAST(2 * de_num AS DOUBLE) END AS alpha
       FROM k0"""

  /** q224: theta-sketch distinct INTERSECTION across sources
    * ([[graft.operators.Sketch.thetaSketch]]/[[graft.operators.Sketch.thetaIntersectPairs]],
    * the KMV/theta framework — Bar-Yossef et al. RANDOM'02; Dasgupta
    * et al. 2016): per source, sketch its word-trigram vocabulary with
    * the k=512 smallest md5 hashes; for every source pair, estimate
    * the shared-vocabulary size DIRECTLY from retained hashes below
    * min(theta) — never by inclusion-exclusion, whose subtraction
    * blows up relative error exactly on small intersections (the
    * NEXT.md caveat). Deterministic hashing makes the whole chain —
    * retained sets, thetas, integral-division estimates — a pure
    * function both engines replay, so the gate is hash-EXACT on the
    * estimates (stronger than the rows-only q45 HLL pattern); the
    * estimate-vs-exact error rides QUALITY.json against the q225
    * twin. At sf0.001 the vocabularies undersaturate k (the sketch IS
    * the set; estimates exact by construction), at sf0.01 they
    * saturate — both regimes gated. */
  val q224_theta_intersect: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val grams = docs.select(col("source"),
      explode(positionalShingles(col("text"), 3)).as("tok"))
    val sk = graft.operators.Sketch.thetaSketch(grams, "source", "tok",
      k = 512)
    graft.operators.Sketch.thetaIntersectPairs(sk, k = 512)
      .select(col("grp_a").as("source_a"), col("grp_b").as("source_b"),
        col("n_common"), col("theta_h"), col("est_inter"))
  }

  val q224_oracle: String =
    """WITH t AS (SELECT source, string_split(text, ' ') toks
         FROM documents),
       g AS (SELECT source,
           array_to_string(toks[i:i+2], ' ') AS tok
         FROM t, unnest(range(1, len(toks) - 1)) AS gs(i)
         WHERE len(toks) >= 3),
       hh AS (SELECT DISTINCT source AS grp,
           CAST(('0x' || substr(md5('th:' || tok), 1, 12)) AS BIGINT)
             + 1 AS h
         FROM g),
       sk AS (SELECT grp, h FROM (
           SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
           FROM hh) WHERE rk <= 512),
       e AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_ret,
           max(h) AS max_h
         FROM sk GROUP BY 1),
       p AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
           a.n_ret AS na, b.n_ret AS nb,
           least(
             CASE WHEN a.n_ret < 512 THEN 281474976710656
                  ELSE a.max_h END,
             CASE WHEN b.n_ret < 512 THEN 281474976710656
                  ELSE b.max_h END) AS theta_h
         FROM e a JOIN e b ON a.grp < b.grp),
       c AS (SELECT x.grp AS grp_a, y.grp AS grp_b,
           CAST(count(*) AS BIGINT) AS ncnt
         FROM sk x JOIN sk y ON x.h = y.h AND x.grp < y.grp
         JOIN p ON p.grp_a = x.grp AND p.grp_b = y.grp
         WHERE x.h <= p.theta_h
         GROUP BY 1, 2)
       SELECT p.grp_a AS source_a, p.grp_b AS source_b,
         CAST(coalesce(c.ncnt, 0) AS BIGINT) AS n_common,
         p.theta_h,
         CAST(CASE WHEN p.na < 512 AND p.nb < 512
             THEN coalesce(c.ncnt, 0)
             ELSE (coalesce(c.ncnt, 0) * 281474976710656) // p.theta_h
           END AS BIGINT) AS est_inter
       FROM p LEFT JOIN c
         ON c.grp_a = p.grp_a AND c.grp_b = p.grp_b"""

  /** q225: the EXACT twin of q224 — true shared-trigram-vocabulary
    * size per source pair plus both vocabulary sizes (the q64-vs-q45
    * split applied to intersections: the exact path is hash-verified
    * here while q224 keeps exercising the sketch; QualityProbe diffs
    * the two into QUALITY.json theta bands). */
  val q225_exact_intersect: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val u = docs.select(col("source"),
        explode(positionalShingles(col("text"), 3)).as("tok")).distinct()
      .localCheckpoint(false)
    val sizes = u.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    u.select(col("source").as("source_a"), col("tok"))
      .join(u.select(col("source").as("source_b"), col("tok")),
        Seq("tok"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("nv").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("nv").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_inter"),
        col("n_a"), col("n_b"))
  }

  val q225_oracle: String =
    """WITH t AS (SELECT source, string_split(text, ' ') toks
         FROM documents),
       g AS (SELECT source,
           array_to_string(toks[i:i+2], ' ') AS tok
         FROM t, unnest(range(1, len(toks) - 1)) AS gs(i)
         WHERE len(toks) >= 3),
       u AS (SELECT DISTINCT source, tok FROM g),
       sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
         FROM u GROUP BY 1)
       SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_inter,
         CAST(any_value(sa.nv) AS BIGINT) AS n_a,
         CAST(any_value(sb.nv) AS BIGINT) AS n_b
       FROM u a JOIN u b ON a.tok = b.tok AND a.source < b.source
       JOIN sz sa ON sa.source = a.source
       JOIN sz sb ON sb.source = b.source
       GROUP BY 1, 2"""

  /** Shared vote synthesis for q226/q227: three raters score each doc
    * on a 1..5 scale — a deterministic md5 base score, rater h1
    * nudged +1 (mod 5) on ~25% of votes, rater h2 nudged −1 on ~35%,
    * with the q223 per-vote dropout making the panel RAGGED (items
    * carry 0–3 ratings; sub-2 items drop as unpairable, so the
    * observed counts make L = lcm{1,2} = 2, which the oracles
    * replay). */
  private def weightedVotes(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    def h(salt: String) =
      graft.functions.SketchFunctions.md5Prefix(
        concat(lit(salt), col("doc_id").cast("string")), 8)
    def keep(salt: String) = h(salt) % 10 >= 2
    val base = h("ks:") % 5 // 0..4
    docs.filter(keep("kd0:"))
      .select(col("doc_id"), lit("gold").as("rater"),
        (base + 1L).as("score"))
      .unionByName(docs.filter(keep("kd1:"))
        .select(col("doc_id"), lit("h1").as("rater"),
          ((base + when(h("k1:") % 20 < 5, 1L).otherwise(0L)) % 5 + 1L)
            .as("score")))
      .unionByName(docs.filter(keep("kd2:"))
        .select(col("doc_id"), lit("h2").as("rater"),
          ((base + when(h("k2:") % 20 < 7, 4L).otherwise(0L)) % 5 + 1L)
            .as("score")))
  }

  /** The q226/q227 oracle's replay of [[weightedVotes]]. */
  private val weightedVotesSql: String =
    """votes AS (
         SELECT doc_id, 'gold' AS rater,
           1 + CAST(('0x' || substr(md5('ks:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS v
         FROM documents
         WHERE CAST(('0x' || substr(md5('kd0:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2
         UNION ALL
         SELECT doc_id, 'h1',
           1 + (CAST(('0x' || substr(md5('ks:'
                || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5
              + CASE WHEN CAST(('0x' || substr(md5('k1:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 20 < 5 THEN 1 ELSE 0 END) % 5
         FROM documents
         WHERE CAST(('0x' || substr(md5('kd1:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2
         UNION ALL
         SELECT doc_id, 'h2',
           1 + (CAST(('0x' || substr(md5('ks:'
                || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5
              + CASE WHEN CAST(('0x' || substr(md5('k2:'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 20 < 7 THEN 4 ELSE 0 END) % 5
         FROM documents
         WHERE CAST(('0x' || substr(md5('kd2:'
             || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 >= 2),
       o AS (SELECT doc_id, v, CAST(count(*) AS BIGINT) AS o
         FROM votes GROUP BY 1, 2),
       om AS (SELECT doc_id, v, o,
           CAST(sum(o) OVER (PARTITION BY doc_id) AS BIGINT) AS m
         FROM o),
       p AS (SELECT * FROM om WHERE m >= 2)"""

  /** The shared exact interval-metric alpha tail of the q226/q227
    * oracles over rows (doc_id, v, o, m): L = 2 hard-coded (the
    * fixture's observed m ∈ {2,3}), diss_i = 2(m·Σov² − (Σov)²),
    * E = 2(n·Σn_c v² − (Σn_c v)²), one HUGEINT division each. */
  private def alphaTailSql(rows: String): String =
    s"""pi AS (SELECT doc_id, m,
         CAST(sum(o * v * v) AS HUGEINT) AS q2,
         CAST(sum(o * v) AS HUGEINT) AS q1
       FROM $rows GROUP BY 1, 2),
       it AS (SELECT CAST(count(*) AS BIGINT) AS ni,
           CAST(sum(m) AS BIGINT) AS n,
           sum(CAST(2 // (m - 1) AS HUGEINT)
             * (2 * (m * q2 - q1 * q1))) AS uu
         FROM pi),
       mg AS (SELECT CAST(sum(nc * v * v) AS HUGEINT) AS e2,
           CAST(sum(nc * v) AS HUGEINT) AS e1
         FROM (SELECT v, CAST(sum(o) AS BIGINT) AS nc
               FROM $rows GROUP BY v)),
       k0 AS (SELECT ni, n, uu,
           2 * (CAST(n AS HUGEINT) * e2 - e1 * e1) AS e
         FROM it CROSS JOIN mg)
       SELECT n AS n_ratings, ni AS n_items,
         CAST(uu AS DOUBLE) / CAST(2 * n AS DOUBLE) AS "do",
         CAST(e AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS de,
         CASE WHEN e = 0 THEN NULL
           ELSE CAST(2 * e - uu * (n - 1) AS DOUBLE)
             / CAST(2 * e AS DOUBLE) END AS alpha
       FROM k0"""

  /** q226: Krippendorff's alpha, INTERVAL metric, over the ragged
    * 1..5 quality panel
    * ([[graft.operators.Labeling.krippendorffAlphaInterval]] — the
    * NEXT.md weighted-agreement seam): δ(c,c') = (c−c')², so a 1-vs-5
    * clash costs 16× a 1-vs-2 nudge where q223's nominal metric
    * charges both the same. The lcm-rational exactness survives the
    * kernel swap (per-item disagreement collapses to two exact
    * moments), so do/de/alpha all gate hash-exact. */
  val q226_krippendorff_interval: Q = (s, d) =>
    graft.operators.Labeling.krippendorffAlphaInterval(
      weightedVotes(s, d), "doc_id", "rater", "score")

  val q226_oracle: String =
    s"""WITH $weightedVotesSql,
       ${alphaTailSql("p")}"""

  /** q227: Krippendorff's alpha, ORDINAL metric, same panel
    * ([[graft.operators.Labeling.krippendorffAlphaOrdinal]]):
    * distances measured in marginal mass between ranks — the metric
    * for ordered categories whose spacing is not meaningful. Reduces
    * exactly to the interval machinery over the integer category
    * values W'_c = 2·cum_c − n_c (the ×4 metric scale cancels in α;
    * do/de are reported in the W' metric, which the oracle replays). */
  val q227_krippendorff_ordinal: Q = (s, d) =>
    graft.operators.Labeling.krippendorffAlphaOrdinal(
      weightedVotes(s, d), "doc_id", "rater", "score")

  val q227_oracle: String =
    s"""WITH $weightedVotesSql,
       w AS (SELECT v,
           2 * CAST(sum(nc) OVER (ORDER BY v) AS BIGINT) - nc AS wv
         FROM (SELECT v, CAST(sum(o) AS BIGINT) AS nc
               FROM p GROUP BY v)),
       pw AS (SELECT p.doc_id, w.wv AS v, p.o, p.m
         FROM p JOIN w ON p.v = w.v),
       ${alphaTailSql("pw")}"""

  /** q228: the full theta set algebra
    * ([[graft.operators.Sketch.thetaSetOpPairs]]) over the q224
    * fixture — per source pair, union / intersection / BOTH
    * differences of trigram vocabularies from ONE sketch. The union
    * and difference counts are inclusion-exclusion on EXACT retained
    * below-theta counts (integer bookkeeping), never on estimates —
    * the error-inflation the direct framework exists to avoid. Same
    * determinism argument as q224, so every count AND estimate gates
    * hash-exact. */
  val q228_theta_setops: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val grams = docs.select(col("source"),
      explode(positionalShingles(col("text"), 3)).as("tok"))
    val sk = graft.operators.Sketch.thetaSketch(grams, "source", "tok",
      k = 512)
    graft.operators.Sketch.thetaSetOpPairs(sk, k = 512)
      .select(col("grp_a").as("source_a"), col("grp_b").as("source_b"),
        col("theta_h"), col("n_common"), col("est_inter"),
        col("n_union"), col("est_union"),
        col("n_only_a"), col("est_only_a"),
        col("n_only_b"), col("est_only_b"))
  }

  val q228_oracle: String =
    """WITH t AS (SELECT source, string_split(text, ' ') toks
         FROM documents),
       g AS (SELECT source,
           array_to_string(toks[i:i+2], ' ') AS tok
         FROM t, unnest(range(1, len(toks) - 1)) AS gs(i)
         WHERE len(toks) >= 3),
       hh AS (SELECT DISTINCT source AS grp,
           CAST(('0x' || substr(md5('th:' || tok), 1, 12)) AS BIGINT)
             + 1 AS h
         FROM g),
       sk AS (SELECT grp, h FROM (
           SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
           FROM hh) WHERE rk <= 512),
       e AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_ret,
           max(h) AS max_h
         FROM sk GROUP BY 1),
       p AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
           a.n_ret AS na, b.n_ret AS nb,
           least(
             CASE WHEN a.n_ret < 512 THEN 281474976710656
                  ELSE a.max_h END,
             CASE WHEN b.n_ret < 512 THEN 281474976710656
                  ELSE b.max_h END) AS theta_h
         FROM e a JOIN e b ON a.grp < b.grp),
       ba AS (SELECT p.grp_a, p.grp_b,
           CAST(count(*) AS BIGINT) AS nab
         FROM sk x JOIN p ON p.grp_a = x.grp
         WHERE x.h <= p.theta_h GROUP BY 1, 2),
       bb AS (SELECT p.grp_a, p.grp_b,
           CAST(count(*) AS BIGINT) AS nbb
         FROM sk x JOIN p ON p.grp_b = x.grp
         WHERE x.h <= p.theta_h GROUP BY 1, 2),
       c AS (SELECT x.grp AS grp_a, y.grp AS grp_b,
           CAST(count(*) AS BIGINT) AS ncnt
         FROM sk x JOIN sk y ON x.h = y.h AND x.grp < y.grp
         JOIN p ON p.grp_a = x.grp AND p.grp_b = y.grp
         WHERE x.h <= p.theta_h
         GROUP BY 1, 2),
       f AS (SELECT p.grp_a, p.grp_b, p.na, p.nb, p.theta_h,
           coalesce(ba.nab, 0) AS nab, coalesce(bb.nbb, 0) AS nbb,
           coalesce(c.ncnt, 0) AS ncnt
         FROM p LEFT JOIN ba ON ba.grp_a = p.grp_a AND ba.grp_b = p.grp_b
         LEFT JOIN bb ON bb.grp_a = p.grp_a AND bb.grp_b = p.grp_b
         LEFT JOIN c ON c.grp_a = p.grp_a AND c.grp_b = p.grp_b)
       SELECT grp_a AS source_a, grp_b AS source_b, theta_h,
         CAST(ncnt AS BIGINT) AS n_common,
         CAST(CASE WHEN na < 512 AND nb < 512 THEN ncnt
           ELSE (ncnt * 281474976710656) // theta_h END AS BIGINT)
           AS est_inter,
         CAST(nab + nbb - ncnt AS BIGINT) AS n_union,
         CAST(CASE WHEN na < 512 AND nb < 512 THEN nab + nbb - ncnt
           ELSE ((nab + nbb - ncnt) * 281474976710656) // theta_h
           END AS BIGINT) AS est_union,
         CAST(nab - ncnt AS BIGINT) AS n_only_a,
         CAST(CASE WHEN na < 512 AND nb < 512 THEN nab - ncnt
           ELSE ((nab - ncnt) * 281474976710656) // theta_h
           END AS BIGINT) AS est_only_a,
         CAST(nbb - ncnt AS BIGINT) AS n_only_b,
         CAST(CASE WHEN na < 512 AND nb < 512 THEN nbb - ncnt
           ELSE ((nbb - ncnt) * 281474976710656) // theta_h
           END AS BIGINT) AS est_only_b
       FROM f"""

  /** q229: MERGED-shards theta estimate
    * ([[graft.operators.Sketch.thetaMerge]] as a GATE, not just a
    * spec): per-language trigram-vocabulary estimates built by
    * sketching each (lang, source) SHARD independently and merging the
    * shard sketches — the 100 TB build shape, where day/shard
    * partitions sketch once and history never re-scans. The oracle
    * computes the DIRECT per-language sketch, so the gate proves
    * merge-of-shards == direct-sketch end to end against DuckDB (the
    * k smallest of a union are reachable from the per-shard k
    * smallest — the KMV mergeability theorem — and both engines agree
    * hash-exactly). */
  val q229_theta_merged: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val grams = docs.select(
      concat_ws("/", col("lang"), col("source")).as("shard"),
      col("lang"), explode(positionalShingles(col("text"), 3)).as("tok"))
    val shardSk = graft.operators.Sketch.thetaSketch(grams, "shard",
      "tok", k = 512)
    // re-key shard sketches to their language and merge
    val relabeled = shardSk
      .select(substring_index(col("grp"), "/", 1).as("grp"), col("h"))
    val merged = graft.operators.Sketch.thetaMerge(Seq(relabeled),
      k = 512)
    graft.operators.Sketch.thetaEstimate(merged, k = 512)
      .select(col("grp").as("lang"), col("n_retained"),
        col("theta_h"), col("est"))
  }

  val q229_oracle: String =
    """WITH t AS (SELECT lang, string_split(text, ' ') toks
         FROM documents),
       g AS (SELECT lang,
           array_to_string(toks[i:i+2], ' ') AS tok
         FROM t, unnest(range(1, len(toks) - 1)) AS gs(i)
         WHERE len(toks) >= 3),
       hh AS (SELECT DISTINCT lang AS grp,
           CAST(('0x' || substr(md5('th:' || tok), 1, 12)) AS BIGINT)
             + 1 AS h
         FROM g),
       sk AS (SELECT grp, h FROM (
           SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
           FROM hh) WHERE rk <= 512)
       SELECT grp AS lang, CAST(count(*) AS BIGINT) AS n_retained,
         CASE WHEN count(*) < 512 THEN 281474976710656
              ELSE max(h) END AS theta_h,
         CAST(CASE WHEN count(*) < 512 THEN count(*)
           ELSE (511 * 281474976710656) // max(h) END AS BIGINT) AS est
       FROM sk GROUP BY grp"""

  /** q230: HDR-histogram quantile brackets per language
    * ([[graft.operators.Sketch.hdrSketch]]/[[graft.operators.Sketch.hdrQuantiles]]
    * — HdrHistogram bucketing under the DDSketch relative-error
    * framing, Masson et al. VLDB 2019): p50/p90/p99 of document
    * length from a ≤ ~1.9k-cell-per-group histogram instead of a
    * per-group sort of the data. b = 5 significant bits → every
    * bracket [est_lb, est_ub] contains the true order statistic with
    * ≤ 2^-5 relative width. Buckets are bin()+shift integer
    * arithmetic both engines share, so sketch, cumulative ranks, and
    * brackets gate hash-EXACT (the q167/q224 determinism discipline
    * applied to quantiles — KLL/t-digest could not gate this way,
    * their compaction depends on arrival order); the bracket-vs-exact
    * error rides QUALITY.json against the q231 twin. */
  val q230_hdr_quantiles: Q = (s, d) => {
    val sk = graft.operators.Sketch.hdrSketch(Tables.documents(s, d),
      "lang", "n_chars", b = 5)
    graft.operators.Sketch.hdrQuantiles(sk, Seq(500, 900, 990), b = 5)
      .select(col("grp").as("lang"), col("permille"), col("n"),
        col("est_lb"), col("est_ub"))
  }

  private val hdrWidthSql: String =
    """(CASE WHEN length(bin(%s)) - 1 <= 5 THEN 1
      ELSE 1::BIGINT << (length(bin(%s)) - 6) END)"""

  val q230_oracle: String =
    s"""WITH v AS (SELECT lang, CAST(n_chars AS BIGINT) AS v
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND n_chars >= 0),
       bkt AS (SELECT lang,
           v - v % ${hdrWidthSql.format("v", "v")} AS lb,
           CAST(count(*) AS BIGINT) AS cnt
         FROM v GROUP BY 1, 2),
       c AS (SELECT lang, lb,
           CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
         FROM bkt),
       p AS (SELECT c.*, q.permille FROM c
         CROSS JOIN (VALUES (500), (900), (990)) AS q(permille)),
       hit AS (SELECT lang, permille, n, min(lb) AS est_lb
         FROM p
         WHERE cum >= greatest(1,
           (CAST(permille AS BIGINT) * n + 999) // 1000)
         GROUP BY 1, 2, 3)
       SELECT lang, CAST(permille AS INT) AS permille, n, est_lb,
         est_lb + ${hdrWidthSql.format("est_lb", "est_lb")} - 1 AS est_ub
       FROM hit"""

  /** q231: the EXACT twin of q230 — true order-statistic p50/p90/p99
    * per language at the same integer ranks (the q64-vs-q45 split
    * applied to quantiles: the exact path is hash-verified here while
    * q230 keeps exercising the sketch; QualityProbe diffs the two
    * into QUALITY.json hdr bands and asserts the bracket guarantee on
    * every row). Costs the per-group DATA sort the sketch exists to
    * avoid — which is the point of gating both. */
  val q231_exact_quantiles: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("v"), col("doc_id"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    Tables.documents(s, d)
      .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
        col("n_chars") >= 0)
      .select(col("lang"), col("n_chars").cast("long").as("v"),
        col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(whole))
      .select(col("lang"), col("rn"), col("v"), col("n"),
        explode(array(lit(500), lit(900), lit(990))).as("permille"))
      .filter(col("rn") === greatest(lit(1L),
        expr("(CAST(permille AS BIGINT) * n + 999) DIV 1000")))
      .select(col("lang"), col("permille"), col("n"),
        col("v").as("exact_v"))
  }

  val q231_oracle: String =
    """WITH r AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY lang
           ORDER BY n_chars, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
       FROM documents
       WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND n_chars >= 0),
       p AS (SELECT r.*, q.permille FROM r
         CROSS JOIN (VALUES (500), (900), (990)) AS q(permille))
       SELECT lang, CAST(permille AS INT) AS permille, n, v AS exact_v
       FROM p
       WHERE rn = greatest(1,
         (CAST(permille AS BIGINT) * n + 999) // 1000)"""

  /** q232: MERGED-shards HDR quantiles
    * ([[graft.operators.Sketch.hdrMerge]] as a GATE): each
    * (lang, source) shard histograms its doc lengths independently;
    * shard sketches re-key to their language and merge by cell-wise
    * sum — the 100 TB build shape (day/shard partitions sketch once,
    * dashboards read merged cells, history never re-scans). The
    * oracle computes the DIRECT per-language sketch, so the gate
    * proves merge-of-shards == direct end to end against DuckDB. */
  val q232_hdr_merged: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val shardSk = graft.operators.Sketch.hdrSketch(
      docs.select(concat_ws("/", col("lang"), col("source"))
        .as("shard"), col("n_chars")),
      "shard", "n_chars", b = 5)
    val relabeled = shardSk.select(
      substring_index(col("grp"), "/", 1).as("grp"), col("lb"),
      col("cnt"))
    val merged = graft.operators.Sketch.hdrMerge(Seq(relabeled))
    graft.operators.Sketch.hdrQuantiles(merged, Seq(500, 900, 990),
        b = 5)
      .select(col("grp").as("lang"), col("permille"), col("n"),
        col("est_lb"), col("est_ub"))
  }

  val q232_oracle: String = q230_oracle

  /** q233: WEIGHTED HDR quantiles — document-length percentiles by
    * TOKEN MASS per source (`weightCol`): "half the training tokens
    * live in docs shorter than X" is the packing/budget question, and
    * it is a weighted quantile, not a row quantile (one 100k-token
    * doc outweighs a thousand 100-token docs). Same bracket guarantee
    * and hash-exact determinism; ranks use the exact integer weight
    * totals (permille · Σw arithmetic stays far inside a long). */
  val q233_hdr_weighted: Q = (s, d) => {
    val items = Tables.documents(s, d)
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w"))
    val sk = graft.operators.Sketch.hdrSketch(items, "source",
      "n_chars", b = 5, weightCol = Some("w"))
    graft.operators.Sketch.hdrQuantiles(sk, Seq(500, 900, 990), b = 5)
      .select(col("grp").as("source"), col("permille"),
        col("n").as("token_mass"), col("est_lb"), col("est_ub"))
  }

  val q233_oracle: String =
    s"""WITH v AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
         FROM documents
         WHERE source IS NOT NULL AND n_chars IS NOT NULL
           AND n_chars >= 0),
       bkt AS (SELECT source,
           v - v % ${hdrWidthSql.format("v", "v")} AS lb,
           CAST(sum(w) AS BIGINT) AS cnt
         FROM v GROUP BY 1, 2),
       c AS (SELECT source, lb,
           CAST(sum(cnt) OVER (PARTITION BY source ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
         FROM bkt),
       p AS (SELECT c.*, q.permille FROM c
         CROSS JOIN (VALUES (500), (900), (990)) AS q(permille)),
       hit AS (SELECT source, permille, n, min(lb) AS est_lb
         FROM p
         WHERE cum >= greatest(1,
           (CAST(permille AS BIGINT) * n + 999) // 1000)
         GROUP BY 1, 2, 3)
       SELECT source, CAST(permille AS INT) AS permille,
         n AS token_mass, est_lb,
         est_lb + ${hdrWidthSql.format("est_lb", "est_lb")} - 1 AS est_ub
       FROM hit"""

  /** q235: JOINT-key and CONDITIONAL theta distinct estimates (the
    * NEXT.md tuple-distinct seam) — per language, from three sketches
    * over one gram scan: (1) distinct trigram vocabulary, (2) the
    * vocabulary of LONG documents only (n_chars ≥ 500 — "how much of
    * the language's vocabulary do the long docs cover" as an exact
    * integral-division permille of two estimates), (3) distinct
    * (source, trigram) TUPLES — the joint key, hashed as one
    * chr(1)-joined string so a tuple is one theta key (provenance
    * cardinality: how many source×gram combinations exist). Same
    * determinism argument as q224: every estimate gates hash-exact
    * including sampling error. Scale shape: ONE corpus scan dedupes
    * the gram stream to (lang, source, is_long, tok) — map-side
    * combined, vocab×sources-sized — and THAT frame checkpoints for
    * the three sketch consumers (the thetaIntersectPairs lesson:
    * materialize the small multi-consumer frame, never the
    * corpus-sized exploded grams); each sketch is then ≤ k rows per
    * group out. */
  val q235_theta_joint: Q = (s, d) => {
    val k = 512
    val grams = Tables.documents(s, d)
      .select(col("lang"), col("source"),
        (col("n_chars") >= 500).as("is_long"),
        explode(positionalShingles(col("text"), 3)).as("tok"))
      .distinct()
      .localCheckpoint(false)
    def est(items: org.apache.spark.sql.DataFrame,
        keyCol: org.apache.spark.sql.Column,
        as: String) =
      graft.operators.Sketch.thetaEstimate(
        graft.operators.Sketch.thetaSketch(
          items.select(col("lang"), keyCol.as("__k")), "lang", "__k", k),
        k).select(col("grp").as("lang"), col("est").as(as))
    est(grams, col("tok"), "est_vocab")
      .join(est(grams.filter(col("is_long")), col("tok"),
        "est_long_vocab"), Seq("lang"))
      .join(est(grams, concat_ws("\u0001", col("source"), col("tok")),
        "est_joint"), Seq("lang"))
      .withColumn("long_permille",
        expr("est_long_vocab * 1000L DIV est_vocab"))
      .select(col("lang"), col("est_vocab"), col("est_long_vocab"),
        col("long_permille"), col("est_joint"))
  }

  val q235_oracle: String =
    """WITH t AS (SELECT lang, source, n_chars,
           string_split(text, ' ') toks
         FROM documents),
       g AS (SELECT lang, source, n_chars,
           array_to_string(toks[i:i+2], ' ') AS tok
         FROM t, unnest(range(1, len(toks) - 1)) AS gs(i)
         WHERE len(toks) >= 3),
       sk1 AS (SELECT grp, h, row_number() OVER (
             PARTITION BY grp ORDER BY h) AS rk
         FROM (SELECT DISTINCT lang AS grp,
             CAST(('0x' || substr(md5('th:' || tok), 1, 12)) AS BIGINT)
               + 1 AS h FROM g)),
       e1 AS (SELECT grp, CAST(CASE WHEN count(*) < 512 THEN count(*)
             ELSE (511 * 281474976710656) // max(h) END AS BIGINT)
             AS est_vocab
         FROM sk1 WHERE rk <= 512 GROUP BY grp),
       sk2 AS (SELECT grp, h, row_number() OVER (
             PARTITION BY grp ORDER BY h) AS rk
         FROM (SELECT DISTINCT lang AS grp,
             CAST(('0x' || substr(md5('th:' || tok), 1, 12)) AS BIGINT)
               + 1 AS h FROM g WHERE n_chars >= 500)),
       e2 AS (SELECT grp, CAST(CASE WHEN count(*) < 512 THEN count(*)
             ELSE (511 * 281474976710656) // max(h) END AS BIGINT)
             AS est_long_vocab
         FROM sk2 WHERE rk <= 512 GROUP BY grp),
       sk3 AS (SELECT grp, h, row_number() OVER (
             PARTITION BY grp ORDER BY h) AS rk
         FROM (SELECT DISTINCT lang AS grp,
             CAST(('0x' || substr(md5('th:' || source || chr(1) || tok),
               1, 12)) AS BIGINT) + 1 AS h FROM g)),
       e3 AS (SELECT grp, CAST(CASE WHEN count(*) < 512 THEN count(*)
             ELSE (511 * 281474976710656) // max(h) END AS BIGINT)
             AS est_joint
         FROM sk3 WHERE rk <= 512 GROUP BY grp)
       SELECT e1.grp AS lang, e1.est_vocab, e2.est_long_vocab,
         CAST(e2.est_long_vocab * 1000 // e1.est_vocab AS BIGINT)
           AS long_permille,
         e3.est_joint
       FROM e1 JOIN e2 ON e1.grp = e2.grp
       JOIN e3 ON e1.grp = e3.grp"""

  /** q240: Poisson-bootstrap confidence interval for mean document
    * length per language ([[graft.operators.Stats.poissonBootstrapCi]]
    * — the Chamandy et al. streaming bootstrap): every row draws a
    * deterministic md5-derived Poisson(1) weight per replicate, so 32
    * bootstrap replicate means cost ONE weighted hash-agg (no
    * resample shuffle — the 100 TB uncertainty method), and because
    * the draws are a pure function of (replicate, doc_id), the
    * interval endpoints gate hash-EXACT: a bootstrap whose "random"
    * resamples the oracle replays. The inverse-CDF thresholds are
    * computed ONCE in Scala ([[graft.operators.Stats.PoissonThresholds]])
    * and interpolated into BOTH engines as integer literals — e^-1
    * never evaluates cross-engine. */
  val q240_bootstrap_ci: Q = (s, d) =>
    graft.operators.Stats.poissonBootstrapCi(Tables.documents(s, d),
        "lang", "n_chars", "doc_id", b = 32)
      .select(col("grp").as("lang"), col("n"), col("b_eff"),
        col("mean"), col("ci_lo"), col("ci_hi"))

  private val bootCaseSql: String =
    graft.operators.Stats.PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN u <= $t THEN $k" }
      .mkString("(CASE ", " ", " ELSE 9 END)")

  val q240_oracle: String =
    s"""WITH base AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v,
           doc_id AS id
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       ov AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS sx
         FROM base GROUP BY 1),
       uu AS (SELECT grp, v, r,
           CAST(('0x' || substr(md5('bs:' || r || ':'
             || CAST(id AS VARCHAR)), 1, 12)) AS BIGINT) + 1 AS u
         FROM base CROSS JOIN range(32) AS t(r)),
       pr AS (SELECT grp, r,
           CAST(sum($bootCaseSql * v) AS BIGINT) AS swx,
           CAST(sum($bootCaseSql) AS BIGINT) AS sw
         FROM uu GROUP BY 1, 2),
       m AS (SELECT grp, r, CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)
           AS m
         FROM pr WHERE sw > 0),
       rk AS (SELECT grp, r, m,
           row_number() OVER (PARTITION BY grp ORDER BY m, r) AS rk,
           CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS b_eff
         FROM m),
       lo AS (SELECT grp, b_eff, m AS ci_lo FROM rk
         WHERE rk = greatest(1, (25 * b_eff + 999) // 1000)),
       hi AS (SELECT grp, m AS ci_hi FROM rk
         WHERE rk = greatest(1, (975 * b_eff + 999) // 1000))
       SELECT ov.grp AS lang, ov.n, lo.b_eff,
         CAST(ov.sx AS DOUBLE) / CAST(ov.n AS DOUBLE) AS mean,
         lo.ci_lo, hi.ci_hi
       FROM ov JOIN lo ON lo.grp = ov.grp JOIN hi ON hi.grp = ov.grp"""

  /** q242: Poisson-bootstrap CI for a RATIO metric — tokens-per-char
    * per language ([[graft.operators.Stats.poissonBootstrapRatioCi]]):
    * the ratio-of-totals estimator whose row-level covariance a
    * per-row-mean CI gets wrong; each replicate reweights numerator
    * and denominator with the SAME deterministic Poisson draw, so the
    * replicate ratios carry the joint variation and every endpoint
    * still gates hash-exact (the q240 determinism argument, same
    * threshold literals in both engines). */
  val q242_bootstrap_ratio: Q = (s, d) =>
    graft.operators.Stats.poissonBootstrapRatioCi(
        Tables.documents(s, d).select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          col("n_chars")),
        "lang", "toks", "n_chars", "doc_id", b = 32)
      .select(col("grp").as("lang"), col("n"), col("b_eff"),
        col("ratio"), col("ci_lo"), col("ci_hi"))

  val q242_oracle: String =
    s"""WITH base AS (SELECT lang AS grp,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
           CAST(n_chars AS BIGINT) AS y, doc_id AS id
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       ov AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
         FROM base GROUP BY 1 HAVING sum(y) > 0),
       uu AS (SELECT grp, x, y, r,
           CAST(('0x' || substr(md5('bs:' || r || ':'
             || CAST(id AS VARCHAR)), 1, 12)) AS BIGINT) + 1 AS u
         FROM base CROSS JOIN range(32) AS t(r)),
       pr AS (SELECT grp, r,
           CAST(sum($bootCaseSql * x) AS BIGINT) AS swx,
           CAST(sum($bootCaseSql * y) AS BIGINT) AS swy
         FROM uu GROUP BY 1, 2),
       m AS (SELECT grp, r, CAST(swx AS DOUBLE) / CAST(swy AS DOUBLE)
           AS m
         FROM pr WHERE swy > 0),
       rk AS (SELECT grp, r, m,
           row_number() OVER (PARTITION BY grp ORDER BY m, r) AS rk,
           CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS b_eff
         FROM m),
       lo AS (SELECT grp, b_eff, m AS ci_lo FROM rk
         WHERE rk = greatest(1, (25 * b_eff + 999) // 1000)),
       hi AS (SELECT grp, m AS ci_hi FROM rk
         WHERE rk = greatest(1, (975 * b_eff + 999) // 1000))
       SELECT ov.grp AS lang, ov.n, lo.b_eff,
         CAST(ov.sx AS DOUBLE) / CAST(ov.sy AS DOUBLE) AS ratio,
         lo.ci_lo, hi.ci_hi
       FROM ov JOIN lo ON lo.grp = ov.grp JOIN hi ON hi.grp = ov.grp"""

  /** q244: Poisson-bootstrap confidence interval for the MEDIAN
    * document length per language
    * ([[graft.operators.Stats.poissonBootstrapQuantileCi]]): the
    * quantile uncertainty surface — each of the 32 replicates is a
    * weighted HDR sketch (one hash-agg of b·buckets cells, never a
    * resample or a per-group sort), its median bracketed by the
    * weighted cumulative bucket walk, and the CI is the order
    * statistics of those brackets. The whole surface is LONGS (HDR
    * bucket lower bounds), so the point estimate AND both interval
    * endpoints gate hash-exact — zero IEEE ops anywhere; same
    * single-source-of-truth Poisson thresholds as q240. */
  val q244_bootstrap_median: Q = (s, d) =>
    graft.operators.Stats.poissonBootstrapQuantileCi(
        Tables.documents(s, d), "lang", "n_chars", "doc_id",
        b = 32, permille = 500, hdrB = 5)
      .select(col("grp").as("lang"), col("n"), col("b_eff"),
        col("est_lb"), col("est_ub"), col("ci_lo_lb"), col("ci_hi_lb"))

  val q244_oracle: String =
    s"""WITH base AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS v,
           doc_id AS id
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND n_chars >= 0 AND doc_id IS NOT NULL),
       bb AS (SELECT grp,
           v - v % (CASE WHEN length(bin(v)) - 1 <= 5 THEN 1
             ELSE 1::BIGINT << (length(bin(v)) - 6) END) AS lb, id
         FROM base),
       sk AS (SELECT grp, lb, CAST(count(*) AS BIGINT) AS cnt
         FROM bb GROUP BY 1, 2),
       c AS (SELECT grp, lb,
           CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
         FROM sk),
       pt AS (SELECT grp, n, min(lb) AS est_lb FROM c
         WHERE cum >= greatest(1, (500 * n + 999) // 1000)
         GROUP BY 1, 2),
       uu AS (SELECT grp, lb, r,
           CAST(('0x' || substr(md5('bs:' || r || ':'
             || CAST(id AS VARCHAR)), 1, 12)) AS BIGINT) + 1 AS u
         FROM bb CROSS JOIN range(32) AS t(r)),
       rs AS (SELECT grp, r, lb, CAST(sum($bootCaseSql) AS BIGINT)
           AS cnt
         FROM uu GROUP BY 1, 2, 3),
       rc AS (SELECT grp, r, lb,
           CAST(sum(cnt) OVER (PARTITION BY grp, r ORDER BY lb)
             AS BIGINT) AS cum,
           CAST(sum(cnt) OVER (PARTITION BY grp, r) AS BIGINT) AS nr
         FROM rs),
       rm AS (SELECT grp, r, min(lb) AS m FROM rc
         WHERE nr > 0 AND cum >= greatest(1, (500 * nr + 999) // 1000)
         GROUP BY 1, 2),
       rk AS (SELECT grp, r, m,
           row_number() OVER (PARTITION BY grp ORDER BY m, r) AS rk,
           CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS b_eff
         FROM rm),
       lo AS (SELECT grp, b_eff, m AS ci_lo_lb FROM rk
         WHERE rk = greatest(1, (25 * b_eff + 999) // 1000)),
       hi AS (SELECT grp, m AS ci_hi_lb FROM rk
         WHERE rk = greatest(1, (975 * b_eff + 999) // 1000))
       SELECT pt.grp AS lang, pt.n, lo.b_eff, pt.est_lb,
         pt.est_lb + (CASE WHEN length(bin(pt.est_lb)) - 1 <= 5 THEN 1
           ELSE 1::BIGINT << (length(bin(pt.est_lb)) - 6) END) - 1
           AS est_ub,
         lo.ci_lo_lb, hi.ci_hi_lb
       FROM pt JOIN lo ON lo.grp = pt.grp JOIN hi ON hi.grp = pt.grp"""

  /** q246: exact ROC AUC per language
    * ([[graft.operators.Classifier.aucRoc]] — Mann–Whitney U with
    * midrank ties, Hanley & McNeil 1982): how well document LENGTH
    * ranks "contains the token 'the'" — the does-this-signal-
    * discriminate readout a curation pipeline runs before promoting a
    * score to a filter (the companion of q163's threshold sweep: the
    * sweep reads one cutoff, AUC grades the whole ranking). Ranks
    * never materialize: one hash-agg to (lang, n_chars) cells, the
    * doubled-midrank identity 2C + c_tot + 1 over the cumulative
    * walk, exact 128-bit sums — auc is ONE IEEE division and gates
    * hash-exact, ties and all. */
  val q246_auc_signal: Q = (s, d) =>
    graft.operators.Classifier.aucRoc(
        Tables.documents(s, d).select(col("lang"), col("n_chars"),
          col("text").contains("the").as("gold")),
        "lang", "n_chars", "gold")
      .select(col("grp").as("lang"), col("n_pos"), col("n_neg"),
        col("u2_num"), col("auc"))

  val q246_oracle: String =
    """WITH b AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS s,
           contains(text, 'the') AS g
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND text IS NOT NULL),
       cs AS (SELECT grp, s,
           CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
           CAST(count(*) AS BIGINT) AS c_tot
         FROM b GROUP BY 1, 2),
       cc AS (SELECT grp, s, c_pos, c_tot,
           CAST(sum(c_tot) OVER (PARTITION BY grp ORDER BY s)
             AS BIGINT) - c_tot AS cum
         FROM cs),
       a AS (SELECT grp, CAST(sum(c_pos) AS BIGINT) AS n_pos,
           CAST(sum(c_tot - c_pos) AS BIGINT) AS n_neg,
           sum(CAST(c_pos AS HUGEINT) * (2 * cum + c_tot + 1)) AS r2
         FROM cc GROUP BY 1)
       SELECT grp AS lang, n_pos, n_neg,
         CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
           AS u2_num,
         CASE WHEN n_pos > 0 AND n_neg > 0 THEN
           CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE) END
           AS auc
       FROM a"""

  /** q247: priority sample of documents per source, weighted by
    * n_chars ([[graft.operators.Sample.prioritySample]] — Duffield,
    * Lund & Thorup JACM 2007): the k = 8 highest w/u priorities per
    * source with the (k+1)-th priority as threshold τ and
    * ŵ = max(w, τ) per kept row — the weighted sample whose subset
    * sums stay answerable after the corpus is gone. Priorities are
    * fixed-point quotients w·2^32 div u of the md5 variate (exact
    * integer arithmetic both engines share), so membership, τ, and
    * every ŵ gate hash-exact; at sf0.001 most sources are
    * unsaturated (τ = 0, estimator exact), at sf0.01 they saturate —
    * both regimes across the two gate SFs. */
  val q247_priority_sample: Q = (s, d) =>
    graft.operators.Sample.prioritySample(Tables.documents(s, d),
        "source", "doc_id", "n_chars", k = 8)
      .select(col("grp").as("source"), col("id").as("doc_id"),
        col("w"), col("q_fp"), col("tau"), col("w_est"))

  val q247_oracle: String =
    """WITH b AS (SELECT source AS grp, doc_id AS id,
           CAST(n_chars AS BIGINT) AS w
         FROM documents
         WHERE source IS NOT NULL AND doc_id IS NOT NULL
           AND n_chars IS NOT NULL AND n_chars > 0),
       q AS (SELECT grp, id, w,
           CAST((CAST(w AS HUGEINT) * 4294967296) //
             (CAST(('0x' || substr(md5('pri:' || CAST(id AS VARCHAR)),
               1, 8)) AS BIGINT) + 1) AS BIGINT) AS q_fp
         FROM b),
       r AS (SELECT grp, id, w, q_fp, row_number() OVER (
           PARTITION BY grp ORDER BY q_fp DESC, id) AS rk
         FROM q),
       t AS (SELECT grp, q_fp AS tau FROM r WHERE rk = 9)
       SELECT r.grp AS source, r.id AS doc_id, r.w, r.q_fp,
         coalesce(t.tau, 0) AS tau,
         greatest(r.w, coalesce(t.tau, 0)) AS w_est
       FROM r LEFT JOIN t ON t.grp = r.grp WHERE r.rk <= 8"""

  /** q248: the priority-sample ESTIMATOR readout — per source, the
    * exact corpus char mass beside the mass estimated from ONLY the
    * q247 sample's ŵ = max(w, τ) values (the q224-vs-q225 split:
    * estimator and truth in one hash-checked surface). Unsaturated
    * sources match exactly; saturated ones carry the DLT sampling
    * error, which the gate pins hash-exactly rather than
    * band-checks — the determinism makes even the error replayable. */
  val q248_priority_estimate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val sample = graft.operators.Sample.prioritySample(docs, "source",
      "doc_id", "n_chars", k = 8)
    val exact = docs
      .filter(col("source").isNotNull && col("doc_id").isNotNull &&
        col("n_chars").isNotNull && col("n_chars") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars").cast("long")).as("total_w"))
    exact.join(
        sample.groupBy(col("grp").as("source"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("w_est")).as("est_w")),
        Seq("source"))
  }

  val q248_oracle: String =
    """WITH b AS (SELECT source AS grp, doc_id AS id,
           CAST(n_chars AS BIGINT) AS w
         FROM documents
         WHERE source IS NOT NULL AND doc_id IS NOT NULL
           AND n_chars IS NOT NULL AND n_chars > 0),
       q AS (SELECT grp, id, w,
           CAST((CAST(w AS HUGEINT) * 4294967296) //
             (CAST(('0x' || substr(md5('pri:' || CAST(id AS VARCHAR)),
               1, 8)) AS BIGINT) + 1) AS BIGINT) AS q_fp
         FROM b),
       r AS (SELECT grp, id, w, q_fp, row_number() OVER (
           PARTITION BY grp ORDER BY q_fp DESC, id) AS rk
         FROM q),
       t AS (SELECT grp, q_fp AS tau FROM r WHERE rk = 9),
       smp AS (SELECT r.grp, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(greatest(r.w, coalesce(t.tau, 0))) AS BIGINT)
             AS est_w
         FROM r LEFT JOIN t ON t.grp = r.grp WHERE r.rk <= 8
         GROUP BY 1),
       ex AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(w) AS BIGINT) AS total_w
         FROM b GROUP BY 1)
       SELECT ex.grp AS source, ex.n, ex.total_w, smp.n_sampled,
         smp.est_w
       FROM ex JOIN smp ON smp.grp = ex.grp"""

  /** q249: distribution-shape census of document length per language
    * ([[graft.operators.Stats.momentCensus]]): mean, sample variance,
    * population skewness g1, excess kurtosis g2 — the HOW companion
    * of the q-series KS drift gates (KS says the distribution moved;
    * the census says which tail and how peaked). Power sums are exact
    * 128-bit integers, the n-powers cancel in the moment ratios, and
    * every statistic is a fixed tree of correctly-rounded IEEE ops
    * (g1 = M3/(M2·√M2) — the x^1.5 expressed as multiply + sqrt,
    * both exactly rounded), so four float statistics gate
    * hash-exact. */
  val q249_moment_census: Q = (s, d) =>
    graft.operators.Stats.momentCensus(Tables.documents(s, d),
        "lang", "n_chars")
      .select(col("grp").as("lang"), col("n"), col("mean"),
        col("variance"), col("g1_skew"), col("g2_kurt"))

  val q249_oracle: String =
    """WITH b AS (SELECT lang AS grp, CAST(n_chars AS HUGEINT) AS v
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
       a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           sum(v) AS s1, sum(v*v) AS s2, sum(v*v*v) AS s3,
           sum(v*v*v*v) AS s4
         FROM b GROUP BY 1),
       m AS (SELECT grp, n, CAST(n AS HUGEINT) AS nh, s1,
           CAST(n AS HUGEINT)*s2 - s1*s1 AS m2,
           CAST(n AS HUGEINT)*CAST(n AS HUGEINT)*s3
             - 3*CAST(n AS HUGEINT)*s1*s2 + 2*s1*s1*s1 AS m3,
           CAST(n AS HUGEINT)*CAST(n AS HUGEINT)*CAST(n AS HUGEINT)*s4
             - 4*CAST(n AS HUGEINT)*CAST(n AS HUGEINT)*s1*s3
             + 6*CAST(n AS HUGEINT)*s1*s1*s2 - 3*s1*s1*s1*s1 AS m4
         FROM a)
       SELECT grp AS lang, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CASE WHEN n >= 2 THEN
           CAST(m2 AS DOUBLE) / CAST(nh*(nh-1) AS DOUBLE) END
           AS variance,
         CASE WHEN m2 > 0 THEN CAST(m3 AS DOUBLE)
           / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))) END
           AS g1_skew,
         CASE WHEN m2 > 0 THEN CAST(m4 AS DOUBLE)
           / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0 END
           AS g2_kurt
       FROM m"""

  /** q250: 5%-trimmed and winsorized mean document length per source
    * ([[graft.operators.Stats.trimmedMeanCensus]]): the robust
    * location readout — one pathological document cannot move either
    * statistic, unlike the plain mean beside them in q240's CI. Ranks
    * never materialize: the kept mass per distinct value is an
    * integer interval overlap on the cumulative walk (the q246 AUC
    * frame), boundary order statistics fall out of the same frame,
    * and both means are ONE IEEE division of exact 128-bit sums —
    * hash-exact, duplicates straddling the cut included. */
  val q250_trimmed_mean: Q = (s, d) =>
    graft.operators.Stats.trimmedMeanCensus(Tables.documents(s, d),
        "source", "n_chars", trimPermille = 50)
      .select(col("grp").as("source"), col("n"), col("n_kept"),
        col("q_lo"), col("q_hi"), col("trimmed_sum"),
        col("trimmed_mean"), col("winsor_mean"))

  val q250_oracle: String =
    """WITH b AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v
         FROM documents
         WHERE source IS NOT NULL AND n_chars IS NOT NULL),
       cs AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
         FROM b GROUP BY 1, 2),
       w AS (SELECT grp, v, c,
           CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n,
           CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
             - c AS cum
         FROM cs),
       k AS (SELECT grp, v, c, n, cum, (50 * n) // 1000 AS t,
           greatest(0, least(cum + c, n - (50 * n) // 1000)
             - greatest(cum, (50 * n) // 1000)) AS kept
         FROM w),
       a AS (SELECT grp, min(n) AS n, min(t) AS t,
           min(CASE WHEN cum + c >= t + 1 THEN v END) AS q_lo,
           min(CASE WHEN cum + c >= n - t THEN v END) AS q_hi,
           sum(CAST(v AS HUGEINT) * kept) AS tsum
         FROM k GROUP BY 1)
       SELECT grp AS source, n, n - 2*t AS n_kept, q_lo, q_hi,
         CAST(tsum AS BIGINT) AS trimmed_sum,
         CAST(tsum AS DOUBLE) / CAST(n - 2*t AS DOUBLE)
           AS trimmed_mean,
         CAST(tsum + CAST(t AS HUGEINT)*q_lo + CAST(t AS HUGEINT)*q_hi
           AS DOUBLE) / CAST(n AS DOUBLE) AS winsor_mean
       FROM a"""

  /** q251: Benjamini–Hochberg FDR over twenty per-source A/B χ² tests
    * ([[graft.operators.Stats.chiSquareBhFdr]], Benjamini & Hochberg
    * 1995): does length (> 300 chars) associate with containing
    * "the", per source — with the multiple-testing correction that
    * q210's single-threshold flag lacks: at α = 0.05 over 20 slices
    * one null slice fires by chance; BH rejects the largest
    * χ²-descending prefix clearing crit(i·α/m) and bounds the false
    * discovery RATE. The critical values are Acklam-quantile literals
    * computed once in Scala and interpolated into BOTH engines (the
    * q245 discount-table rule), so ranking, line crossing, and every
    * reject decision replay hash-exact. */
  val q251_bh_fdr: Q = (s, d) =>
    graft.operators.Stats.chiSquareBhFdr(
        Tables.documents(s, d).filter(col("source").isNotNull &&
          col("text").isNotNull && col("n_chars").isNotNull),
        "source",
        (col("n_chars") > 300).cast("long"),
        col("text").contains("the").cast("long"),
        m = 20, alphaPermille = 50)
      .select(col("source"), col("n00"), col("n01"),
        col("n10"), col("n11"), col("chi2"), col("rank"), col("crit"),
        col("reject"))

  /** The q251 critical-value CASE, interpolated from the SAME
    * Acklam-quantile computation the Spark side uses. The literals
    * go through CAST('…' AS DOUBLE): a bare decimal literal is a
    * DECIMAL in DuckDB, and its decimal→double conversion lands one
    * ulp off Scala's shortest-round-trip double — the string cast
    * parses straight to the identical IEEE value. */
  private def bhCritCase(v: String): String =
    (1 to 20).map { i =>
      val c = graft.operators.Stats.chi2InvUpper(0.05 * i / 20)
      s"WHEN $i THEN CAST('$c' AS DOUBLE)"
    }.mkString(s"(CASE $v ", " ", " END)")

  val q251_oracle: String =
    s"""WITH u AS (SELECT source AS grp,
           CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS va,
           CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END AS su
         FROM documents
         WHERE source IS NOT NULL AND text IS NOT NULL
           AND n_chars IS NOT NULL),
       agg AS (SELECT grp,
           CAST(sum(CASE WHEN va = 0 AND su = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n00,
           CAST(sum(CASE WHEN va = 0 AND su = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n01,
           CAST(sum(CASE WHEN va = 1 AND su = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n10,
           CAST(sum(CASE WHEN va = 1 AND su = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n11
         FROM u GROUP BY 1),
       st AS (SELECT *,
           CAST(CAST(n11 AS HUGEINT) * n00
             - CAST(n10 AS HUGEINT) * n01 AS DOUBLE) AS diff,
           (CAST(n00 + n01 AS DOUBLE) * CAST(n10 + n11 AS DOUBLE))
             * (CAST(n00 + n10 AS DOUBLE) * CAST(n01 + n11 AS DOUBLE))
             AS den
         FROM agg),
       t AS (SELECT grp, n00, n01, n10, n11,
           CAST(n00 + n01 + n10 + n11 AS DOUBLE) * diff * diff / den
             AS chi2
         FROM st WHERE den > 0),
       r AS (SELECT *, CAST(row_number() OVER (
           ORDER BY chi2 DESC, grp) AS BIGINT) AS rank
         FROM t),
       c AS (SELECT *, CASE WHEN rank <= 20
           THEN ${bhCritCase("rank")} END AS crit
         FROM r),
       i AS (SELECT max(CASE WHEN crit IS NOT NULL AND chi2 >= crit
           THEN rank END) AS istar
         FROM c)
       SELECT c.grp AS source, c.n00, c.n01, c.n10, c.n11, c.chi2,
         c.rank, c.crit,
         (i.istar IS NOT NULL AND c.rank <= i.istar) AS reject
       FROM c CROSS JOIN i"""

  /** q252: Spearman rank correlation of document length vs token
    * count per language ([[graft.operators.Stats.spearmanCorr]]):
    * the robust co-movement readout — Pearson on midranks, so one
    * pathological document bends the correlation by one rank step,
    * not its magnitude. Doubled midranks are integers off the
    * cumulative walk (the q246 identity), rows pick them up by value
    * equi-join, the ×2 cancels, and rho = one fixed
    * sqrt·sqrt·divide tree over exact 128-bit rank sums — hash-exact
    * with ties. */
  val q252_spearman: Q = (s, d) =>
    graft.operators.Stats.spearmanCorr(
        Tables.documents(s, d).select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("toks")),
        "lang", "n_chars", "toks")
      .select(col("grp").as("lang"), col("n"), col("rho"))

  val q252_oracle: String =
    """WITH b AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS x,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS y
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND text IS NOT NULL),
       xr AS (SELECT grp, x,
           2*(CAST(sum(c) OVER (PARTITION BY grp ORDER BY x)
             AS BIGINT) - c) + c + 1 AS rx2
         FROM (SELECT grp, x, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2)),
       yr AS (SELECT grp, y,
           2*(CAST(sum(c) OVER (PARTITION BY grp ORDER BY y)
             AS BIGINT) - c) + c + 1 AS ry2
         FROM (SELECT grp, y, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2)),
       j AS (SELECT b.grp, rx2, ry2 FROM b
         JOIN xr ON xr.grp = b.grp AND xr.x = b.x
         JOIN yr ON yr.grp = b.grp AND yr.y = b.y),
       a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(rx2 AS HUGEINT)) AS sx,
           sum(CAST(ry2 AS HUGEINT)) AS sy,
           sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
           sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
           sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy
         FROM j GROUP BY 1)
       SELECT grp AS lang, n,
         CASE WHEN (CAST(n AS HUGEINT)*sxx - sx*sx) > 0
             AND (CAST(n AS HUGEINT)*syy - sy*sy) > 0 THEN
           least(CAST(1 AS DOUBLE), greatest(CAST(-1 AS DOUBLE),
             CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(CAST(n AS HUGEINT)*syy - sy*sy
                    AS DOUBLE))))) END AS rho
       FROM a"""

  /** q253: Mann–Whitney rank-sum test — do English documents run
    * LONGER than German ones? ([[graft.operators.Stats
    * .mannWhitneyTest]]): the location companion of the KS drift
    * gates — KS fires on any shape difference, this one asks the
    * directional ranking question, robust to outlier magnitudes. The
    * tie-corrected z is a fixed divide–sqrt–divide tree over exact
    * 128-bit midrank/tie sums off the pooled PrefixSum walk, so the
    * statistic itself gates hash-exact and the 5% two-sided decision
    * is a literal comparison. */
  val q253_mann_whitney: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Stats.mannWhitneyTest(
      docs.filter(col("lang") === "en").select(col("n_chars")),
      docs.filter(col("lang") === "de").select(col("n_chars")),
      "n_chars")
  }

  val q253_oracle: String =
    """WITH ca AS (SELECT CAST(n_chars AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
         FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
         GROUP BY 1),
       cb AS (SELECT CAST(n_chars AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
         FROM documents WHERE lang = 'de' AND n_chars IS NOT NULL
         GROUP BY 1),
       m AS (SELECT coalesce(ca.v, cb.v) AS v,
           coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
         FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
       w AS (SELECT *, ca + cb AS ct,
           CAST(sum(ca + cb) OVER (ORDER BY v) AS BIGINT) AS ctc
         FROM m),
       s AS (SELECT
           sum(CAST(ca AS HUGEINT) * (2*(ctc - ct) + ct + 1)) AS ra2,
           sum(CAST(ct AS HUGEINT)*ct*ct - ct) AS tcorr,
           CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
           CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb
         FROM w),
       f AS (SELECT na, nb,
           ra2 - CAST(na AS HUGEINT)*(na+1)
             - CAST(na AS HUGEINT)*nb AS u2c,
           CAST(na AS HUGEINT)*nb*
             ((CAST(na AS HUGEINT)+nb+1)
               *(CAST(na AS HUGEINT)+nb)
               *(CAST(na AS HUGEINT)+nb-1) - tcorr) AS vnum,
           12*(CAST(na AS HUGEINT)+nb)*(CAST(na AS HUGEINT)+nb-1)
             AS den
         FROM s)
       SELECT na AS n_a, nb AS n_b, CAST(u2c AS BIGINT) AS u2_num,
         CASE WHEN na > 0 AND nb > 0 AND vnum > 0 THEN
           CAST(u2c AS DOUBLE) / (CAST(2 AS DOUBLE) *
             sqrt(CAST(vnum AS DOUBLE) / CAST(den AS DOUBLE))) END
           AS z,
         CASE WHEN na > 0 AND nb > 0 AND vnum > 0 THEN
           abs(CAST(u2c AS DOUBLE) / (CAST(2 AS DOUBLE) *
             sqrt(CAST(vnum AS DOUBLE) / CAST(den AS DOUBLE))))
             > CAST('1.959963984540054' AS DOUBLE) END AS reject
       FROM f"""

  /** q254: Benford first-digit conformity of document length per
    * language ([[graft.operators.Stats.benfordTest]], Nigrini's
    * forensic screen): fabricated or unit-mangled magnitude columns
    * break the log-uniform first-digit law before they break any
    * range check. The expected proportions log10(1+1/d) are literals
    * computed once in Scala (log10 never evaluates cross-engine), the
    * digit census is one pivoted hash-agg, and χ² is a FIXED
    * nine-term chain — no float agg order exists — so the statistic
    * and the df=8 decision gate hash-exact. (The synthetic lengths
    * here are range-bounded, so non-conformity is the expected
    * honest answer — the gate checks the measurement, not the law.) */
  val q254_benford: Q = (s, d) =>
    graft.operators.Stats.benfordTest(Tables.documents(s, d),
        "lang", "n_chars")
      .select(col("grp").as("lang") +: col("n") +:
        (1 to 9).map(i => col(s"o$i")) :+ col("chi2") :+
        col("conforms"): _*)

  private val benfordChiSql: String =
    (1 to 9).map { i =>
      val p = s"CAST('${graft.operators.Stats.BenfordP(i - 1)}' AS DOUBLE)"
      val e = s"(CAST(n AS DOUBLE) * $p)"
      val diff = s"(CAST(o$i AS DOUBLE) - $e)"
      s"($diff * $diff / $e)"
    }.mkString(" + ")

  val q254_oracle: String = {
    val sums = (1 to 9).map(i =>
      s"CAST(sum(CASE WHEN d = $i THEN 1 ELSE 0 END) AS BIGINT) AS o$i")
      .mkString(",\n           ")
    s"""WITH b AS (SELECT lang AS grp,
           CAST(substr(CAST(CAST(n_chars AS BIGINT) AS VARCHAR), 1, 1)
             AS INT) AS d
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND n_chars > 0),
       a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           $sums
         FROM b GROUP BY 1)
       SELECT grp AS lang, n, o1, o2, o3, o4, o5, o6, o7, o8, o9,
         CASE WHEN n > 0 THEN $benfordChiSql END AS chi2,
         CASE WHEN n > 0 THEN ($benfordChiSql)
           <= CAST('15.50731305586545' AS DOUBLE) END AS conforms
       FROM a"""
  }

  /** q255: standardized effect size (Cohen's d, Hedges' g) of
    * English-vs-German document length per source
    * ([[graft.operators.Stats.effectSize]]): the magnitude companion
    * of q253's rank-sum significance — at corpus n everything is
    * "significant"; d says whether the gap is worth acting on. Each
    * side is one hash-agg to exact 128-bit (n, Σv, Σv²) cells,
    * (n−1)s² = M2/n makes the pooled variance two exact-int
    * divisions, and d/g are fixed divide–subtract–sqrt trees —
    * hash-exact, with sources too small on either side (n < 2)
    * reporting NULL (the degenerate convention). */
  val q255_effect_size: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    graft.operators.Stats.effectSize(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") === "de"),
        "source", "n_chars")
      .select(col("grp").as("source"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("cohen_d"), col("hedges_g"))
  }

  val q255_oracle: String =
    """WITH sa AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_a,
           sum(CAST(n_chars AS HUGEINT)) AS s_a,
           sum(CAST(n_chars AS HUGEINT) * n_chars) AS q_a
         FROM documents
         WHERE lang = 'en' AND source IS NOT NULL
           AND n_chars IS NOT NULL
         GROUP BY 1),
       sb AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_b,
           sum(CAST(n_chars AS HUGEINT)) AS s_b,
           sum(CAST(n_chars AS HUGEINT) * n_chars) AS q_b
         FROM documents
         WHERE lang = 'de' AND source IS NOT NULL
           AND n_chars IS NOT NULL
         GROUP BY 1),
       j AS (SELECT sa.grp, n_a, n_b, s_a, s_b,
           CAST(n_a AS HUGEINT) * q_a - s_a * s_a AS m2a,
           CAST(n_b AS HUGEINT) * q_b - s_b * s_b AS m2b
         FROM sa JOIN sb ON sa.grp = sb.grp),
       f AS (SELECT grp, n_a, n_b,
           CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           CASE WHEN n_a >= 2 AND n_b >= 2
               AND (m2a > 0 OR m2b > 0) THEN
             (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(m2a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 + CAST(m2b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / CAST(n_a + n_b - 2 AS DOUBLE)) END AS cohen_d
         FROM j)
       SELECT grp AS source, n_a, n_b, mean_a, mean_b, cohen_d,
         cohen_d * (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
           / CAST(4 * (n_a + n_b) - 9 AS DOUBLE)) AS hedges_g
       FROM f"""

  /** q256: CUPED variance reduction per language
    * ([[graft.operators.Stats.cuped]], Deng et al. WSDM 2013): token
    * count as the metric, character count as the pre-experiment
    * covariate, doc-id parity as the variant — the A/B sharpener that
    * cuts metric variance by ρ² (here ρ is high: chars predict
    * tokens), i.e. the same power from a fraction of the traffic.
    * θ = cov/var is ONE division of exact 128-bit sums, each adjusted
    * mean a fixed tree — θ, ρ², and both means gate hash-exact. */
  val q256_cuped: Q = (s, d) =>
    graft.operators.Stats.cuped(
        Tables.documents(s, d).select(col("lang"),
          (col("doc_id") % 2).as("variant"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          col("n_chars")),
        "lang", "variant", "toks", "n_chars")
      .select(col("grp").as("lang"), col("variant"), col("n"),
        col("mean_raw"), col("mean_adj"), col("theta"), col("rho2"))

  val q256_oracle: String =
    """WITH b AS (SELECT lang AS grp, doc_id % 2 AS variant,
           CAST(len(string_split(text, ' ')) AS HUGEINT) AS y,
           CAST(n_chars AS HUGEINT) AS x
         FROM documents
         WHERE lang IS NOT NULL AND doc_id IS NOT NULL
           AND text IS NOT NULL AND n_chars IS NOT NULL),
       p AS (SELECT grp, CAST(count(*) AS BIGINT) AS np,
           sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
           sum(y*y) AS syy, sum(x*y) AS sxy
         FROM b GROUP BY 1),
       t AS (SELECT grp, np, sx,
           CAST(np AS HUGEINT)*sxy - sx*sy AS c,
           CAST(np AS HUGEINT)*sxx - sx*sx AS vx,
           CAST(np AS HUGEINT)*syy - sy*sy AS vy
         FROM p),
       th AS (SELECT grp, np, sx,
           CASE WHEN vx > 0 THEN CAST(c AS DOUBLE) / CAST(vx AS DOUBLE)
             END AS theta,
           CASE WHEN vx > 0 AND vy > 0 THEN
             (CAST(c AS DOUBLE) * CAST(c AS DOUBLE))
               / (CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) END AS rho2
         FROM t),
       v AS (SELECT grp, variant, CAST(count(*) AS BIGINT) AS n,
           sum(x) AS sxv, sum(y) AS syv
         FROM b GROUP BY 1, 2)
       SELECT v.grp AS lang, v.variant, v.n,
         CAST(syv AS DOUBLE) / CAST(n AS DOUBLE) AS mean_raw,
         CAST(syv AS DOUBLE) / CAST(n AS DOUBLE) - th.theta *
           (CAST(sxv AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(th.sx AS DOUBLE) / CAST(th.np AS DOUBLE))
           AS mean_adj,
         th.theta, th.rho2
       FROM v JOIN th ON th.grp = v.grp"""

  /** q258: one-pass column census of the documents table
    * ([[graft.operators.Profile.tableCensus]]): per column, row/null/
    * exact-distinct counts and min/max rendered as strings — the
    * first question asked of any new delivery, answered
    * schema-agnostically in one pass (the multi-column exact distinct
    * rides Spark's expand; the documented profiling price). Counts
    * are exact longs; min/max stringify after the TYPED aggregation
    * so numerics order numerically; the fixture is ASCII so string
    * collation cannot diverge (the operator documents the BMP
    * caveat). */
  val q258_table_profile: Q = (s, d) =>
    graft.operators.Profile.tableCensus(Tables.documents(s, d),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  val q258_oracle: String =
    Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count($c) AS BIGINT) AS n_null,
         CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         CAST(min($c) AS VARCHAR) AS min_s,
         CAST(max($c) AS VARCHAR) AS max_s
       FROM documents"""
    }.mkString("\n       UNION ALL\n       ")

  /** q259: Wilson score interval for the per-source "contains 'the'"
    * rate ([[graft.operators.Stats.wilsonCi]], Brown–Cai–DasGupta's
    * recommended default): the rate-with-error-bars readout whose
    * naive Wald cousin collapses to zero width at k = 0 or k = n —
    * exactly the edge sources a curation dashboard most needs bars
    * on. z and z² enter both engines as shared literals, the
    * center/half-width trees mirror op-for-op, so p_hat and both
    * endpoints gate hash-exact. */
  val q259_wilson_ci: Q = (s, d) =>
    graft.operators.Stats.wilsonCi(
        Tables.documents(s, d).select(col("source"),
          col("text").contains("the").as("hit")),
        "source", "hit")
      .select(col("grp").as("source"), col("n"), col("k"),
        col("p_hat"), col("ci_lo"), col("ci_hi"))

  val q259_oracle: String = {
    val z = 1.959963984540054
    val zS = s"CAST('$z' AS DOUBLE)"
    val z2S = s"CAST('${z * z}' AS DOUBLE)"
    s"""WITH a AS (SELECT source AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END)
             AS BIGINT) AS k
         FROM documents
         WHERE source IS NOT NULL AND text IS NOT NULL
         GROUP BY 1),
       f AS (SELECT grp, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
           CAST(1 AS DOUBLE) + $z2S / CAST(n AS DOUBLE) AS denom
         FROM a)
       SELECT grp AS source, n, k, ph AS p_hat,
         (ph + $z2S / (CAST(2 AS DOUBLE) * CAST(n AS DOUBLE))) / denom
           - $zS * sqrt(ph * (CAST(1 AS DOUBLE) - ph)
               / CAST(n AS DOUBLE)
             + $z2S / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n AS DOUBLE))) / denom AS ci_lo,
         (ph + $z2S / (CAST(2 AS DOUBLE) * CAST(n AS DOUBLE))) / denom
           + $zS * sqrt(ph * (CAST(1 AS DOUBLE) - ph)
               / CAST(n AS DOUBLE)
             + $z2S / (CAST(4 AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n AS DOUBLE))) / denom AS ci_hi
       FROM f"""
  }

  /** q260: vocabulary richness per language
    * ([[graft.operators.Drift.vocabRichness]]): Chao1's "how many
    * types exist in the population?" lower bound and Good–Turing
    * sample coverage — the planning numbers behind q199's empirical
    * vocab-growth curve (chao1 says where the curve is heading,
    * coverage how far along it the sample is). N/D/f1/f2 are exact
    * integers off one type-frequency agg; chao1 and coverage are
    * fixed IEEE trees — hash-exact, including the f2 = 0
    * bias-corrected fallback if a slice ever loses its doubletons. */
  val q260_vocab_richness: Q = (s, d) =>
    graft.operators.Drift.vocabRichness(Tables.documents(s, d),
        "lang", "text")
      .select(col("part").as("lang"), col("n_tokens"), col("n_types"),
        col("f1"), col("f2"), col("chao1"), col("coverage"))

  val q260_oracle: String =
    """WITH tp AS (SELECT lang AS part,
         unnest(string_split(text, ' ')) AS tok FROM documents),
       c AS (SELECT part, tok, CAST(count(*) AS BIGINT) AS c
         FROM tp GROUP BY 1, 2),
       a AS (SELECT part, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS f2
         FROM c GROUP BY 1)
       SELECT part AS lang, n_tokens, n_types, f1, f2,
         CASE WHEN f2 > 0 THEN CAST(n_types AS DOUBLE)
             + CAST(CAST(f1 AS HUGEINT) * f1 AS DOUBLE)
               / (CAST(2 AS DOUBLE) * CAST(f2 AS DOUBLE))
           ELSE CAST(n_types AS DOUBLE)
             + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) AS DOUBLE)
               / CAST(2 AS DOUBLE) END AS chao1,
         CAST(1 AS DOUBLE) - CAST(f1 AS DOUBLE)
           / CAST(n_tokens AS DOUBLE) AS coverage
       FROM a"""

  /** q261: capture–recapture vocabulary estimate per language
    * ([[graft.operators.Stats.captureRecapture]], Chapman's
    * bias-corrected Lincoln–Petersen): catch A = the token vocabulary
    * of even doc_ids, catch B = odd doc_ids; the overlap estimates
    * the TOTAL vocabulary — the two-sample cross-check of q260's
    * within-sample Chao1 (two independent routes to the same
    * population answer, both in the gate). n₁/n₂/m are exact distinct
    * counts and the estimate is one division of an exact 128-bit
    * product — hash-exact. */
  val q261_capture_recapture: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def half(parity: Int) = docs
      .filter(col("doc_id") % 2 === parity)
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("tok"))
    graft.operators.Stats.captureRecapture(half(0), half(1),
        "lang", "tok")
      .select(col("grp").as("lang"), col("n1"), col("n2"), col("m"),
        col("est_total"))
  }

  val q261_oracle: String =
    """WITH ca AS (SELECT DISTINCT lang AS grp,
           unnest(string_split(text, ' ')) AS key
         FROM documents
         WHERE doc_id % 2 = 0 AND lang IS NOT NULL
           AND text IS NOT NULL),
       cb AS (SELECT DISTINCT lang AS grp,
           unnest(string_split(text, ' ')) AS key
         FROM documents
         WHERE doc_id % 2 = 1 AND lang IS NOT NULL
           AND text IS NOT NULL),
       na AS (SELECT grp, CAST(count(*) AS BIGINT) AS n1
         FROM ca GROUP BY 1),
       nb AS (SELECT grp, CAST(count(*) AS BIGINT) AS n2
         FROM cb GROUP BY 1),
       ov AS (SELECT ca.grp, CAST(count(*) AS BIGINT) AS m
         FROM ca JOIN cb ON ca.grp = cb.grp AND ca.key = cb.key
         GROUP BY 1)
       SELECT coalesce(na.grp, nb.grp) AS lang,
         coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2,
         coalesce(m, 0) AS m,
         CAST(CAST(coalesce(n1, 0) + 1 AS HUGEINT)
             * (coalesce(n2, 0) + 1) AS DOUBLE)
           / CAST(coalesce(m, 0) + 1 AS DOUBLE)
           - CAST(1 AS DOUBLE) AS est_total
       FROM na FULL OUTER JOIN nb ON na.grp = nb.grp
       LEFT JOIN ov ON ov.grp = coalesce(na.grp, nb.grp)"""

  /** q263: top-decile mass concentration per source
    * ([[graft.operators.Stats.topShare]]): the Lorenz-curve point a
    * storage planner actually reads — "the top 10% of documents hold
    * X% of this source's bytes" — the interpretable companion of
    * q212's Gini index. The q250 one-sided walk: the top-t kept mass
    * per distinct length is an integer interval overlap, sums are
    * exact 128-bit, share is one IEEE division — hash-exact, tie
    * blocks straddling the cut included. */
  val q263_top_share: Q = (s, d) =>
    graft.operators.Stats.topShare(Tables.documents(s, d),
        "source", "n_chars", topPermille = 100)
      .select(col("grp").as("source"), col("n"), col("n_top"),
        col("top_sum"), col("total_sum"), col("share"))

  val q263_oracle: String =
    """WITH b AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v
         FROM documents
         WHERE source IS NOT NULL AND n_chars IS NOT NULL
           AND n_chars >= 0),
       cs AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
         FROM b GROUP BY 1, 2),
       w AS (SELECT grp, v, c,
           CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n,
           CAST(sum(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
             - c AS cum
         FROM cs),
       k AS (SELECT grp, v, c, n, cum,
           (100 * n + 999) // 1000 AS t,
           greatest(0, least(cum + c, n)
             - greatest(cum, n - (100 * n + 999) // 1000)) AS kept
         FROM w),
       a AS (SELECT grp, min(n) AS n, min(t) AS n_top,
           sum(CAST(v AS HUGEINT) * kept) AS top_sum,
           sum(CAST(v AS HUGEINT) * c) AS total_sum
         FROM k GROUP BY 1)
       SELECT grp AS source, n, n_top,
         CAST(top_sum AS BIGINT) AS top_sum,
         CAST(total_sum AS BIGINT) AS total_sum,
         CASE WHEN total_sum > 0 THEN CAST(top_sum AS DOUBLE)
           / CAST(total_sum AS DOUBLE) END AS share
       FROM a"""

  /** q264: sequential A/B testing with always-valid p-values
    * ([[graft.operators.Stats.msprtCuped]], Johari-Koomen-Pekelis-
    * Walsh mSPRT, KDD 2017) — per lang, the CUPED composite
    * v = 2·n_chars − 3·(doc_id % 101) under the frozen θ = 3/2, arms
    * split on residue < 50 (the residue covariate doubles as the
    * fixture's treatment signal, so arms genuinely differ), balanced
    * looks at 8/16/32/64/100 units per arm in doc_id arrival order.
    * Both engines compare the exact integer Δ² against the SAME
    * interpolated mixture-boundary literals
    * ([[graft.operators.Stats.msprtThreshold]] — the Acklam rule:
    * ln/exp evaluate once in Scala, never in-engine), so per-look
    * rejections, the monotone always-valid decision, and the
    * ladder-quantized always-valid p all gate hash-exact. Small
    * groups simply stop emitting looks they never complete — the
    * balanced-look contract — so the emitted row set itself is
    * load-bearing across SFs. */
  val q264_msprt: Q = (s, d) =>
    graft.operators.Stats.msprtCuped(
      Tables.documents(s, d).withColumn("res", col("doc_id") % 101),
      "lang", (col("doc_id") % 101 < 50).cast("int"),
      "n_chars", "res", "doc_id", "doc_id",
      looks = msprtLooks, thetaNum = 3, thetaDen = 2,
      sigma2 = MsprtSigma2, tau2 = MsprtTau2, alphaPermille = 50)
      .select(col("grp").as("lang"), col("look"), col("delta"),
        col("rejected"), col("rejected_any"), col("av_p_permille"))

  private val msprtLooks = Seq(8L, 16L, 32L, 64L, 100L)
  private val MsprtSigma2 = 90000.0
  private val MsprtTau2 = 10000.0

  val q264_oracle: String = {
    import graft.operators.Stats
    def c(n: Long, a: Int): String =
      Stats.msprtThreshold(n, MsprtSigma2, MsprtTau2, a).toString
    val wCols = msprtLooks.indices.map { i =>
      val n = msprtLooks(i)
      s"""sum(CASE WHEN arm = 1 AND rk <= $n THEN v END) AS st_$i,
         count(CASE WHEN arm = 1 AND rk <= $n THEN 1 END) AS ct_$i,
         sum(CASE WHEN arm = 0 AND rk <= $n THEN v END) AS sc_$i,
         count(CASE WHEN arm = 0 AND rk <= $n THEN 1 END) AS cc_$i"""
    }.mkString(",\n         ")
    val branches = msprtLooks.indices.map { i =>
      val n = msprtLooks(i)
      val ladder = Stats.MsprtLadder.map(a =>
        s"WHEN (st_$i - sc_$i) * (st_$i - sc_$i) >= ${c(n, a)} " +
          s"THEN $a").mkString(" ")
      s"""SELECT grp, CAST($n AS BIGINT) AS look,
           CAST(st_$i - sc_$i AS BIGINT) AS delta,
           ((st_$i - sc_$i) * (st_$i - sc_$i) >= ${c(n, 50)})
             AS rejected,
           CASE $ladder ELSE 1000 END AS p_now
         FROM w WHERE ct_$i = $n AND cc_$i = $n"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH b AS (SELECT lang AS grp,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm,
           2 * n_chars - 3 * (doc_id % 101) AS v, doc_id AS i
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       r AS (SELECT grp, arm, v, row_number() OVER (
           PARTITION BY grp, arm ORDER BY i, i) AS rk FROM b),
       w AS (SELECT grp,
         $wCols
         FROM r GROUP BY grp),
       d AS ($branches)
       SELECT grp AS lang, look, delta, rejected,
         (max(CASE WHEN rejected THEN 1 ELSE 0 END) OVER (
            PARTITION BY grp ORDER BY look) = 1) AS rejected_any,
         CAST(min(p_now) OVER (PARTITION BY grp ORDER BY look)
           AS BIGINT) AS av_p_permille
       FROM d"""
  }

  /** q266: Kaplan-Meier survival ([[graft.operators.Survival
    * .kaplanMeier]]) — per lang, time-to-event over right-censored
    * durations (duration = n_chars/10, event for doc_id % 4 > 0 — a
    * quarter of the corpus censors, so the at-risk walk and the
    * flat-survival censor steps are load-bearing). The order-dependent
    * float product — the one surface the fixed-IEEE-tree discipline
    * cannot gate — is replaced by the 2^-40 multiply-then-floor fold,
    * which the oracle replays with a RECURSIVE CTE running the
    * identical integer recurrence: life table AND survival both gate
    * hash-exact. */
  val q266_kaplan_meier: Q = (s, d) =>
    graft.operators.Survival.kaplanMeier(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("n_chars DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e")),
      "lang", "t", "e")
      .select(col("grp").as("lang"), col("t"), col("n_at_risk"),
        col("d"), col("c"), col("surv_fp"), col("surv"))

  val q266_oracle: String =
    """WITH RECURSIVE
       b AS (SELECT lang AS grp, n_chars // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       lt AS (SELECT grp, t, CAST(sum(e) AS BIGINT) AS d,
           CAST(sum(1 - e) AS BIGINT) AS c, count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d, c,
           CAST(sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_at_risk,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM lt),
       s AS (
         SELECT grp, 0 AS i, CAST(1099511627776 AS BIGINT) AS fp
         FROM (SELECT DISTINCT grp FROM rk)
         UNION ALL
         SELECT rk.grp, rk.i,
           (s.fp * (rk.n_at_risk - rk.d)) // rk.n_at_risk
         FROM s JOIN rk ON rk.grp = s.grp AND rk.i = s.i + 1)
       SELECT rk.grp AS lang, rk.t, rk.n_at_risk, rk.d, rk.c,
         CAST(s.fp AS BIGINT) AS surv_fp,
         CAST(s.fp AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS surv
       FROM rk JOIN s ON s.grp = rk.grp AND s.i = rk.i"""

  /** q267: Cochran–Mantel–Haenszel pooled χ²
    * ([[graft.operators.Stats.cmhTest]]) — per cohort (doc_id % 3
    * split), does length associate with containing "the", POOLED
    * across language strata instead of per-slice (q251) or collapsed
    * (q210, where language mix Simpson-confounds the pooled table).
    * The cross-stratum sums are the ordered double fold both engines
    * replay identically (the Kaplan-Meier recursive-CTE move applied
    * to the float-sum-order wall NEXT r15 declared blocking) — χ² and
    * the decision gate hash-exact. */
  val q267_cmh: Q = (s, d) =>
    graft.operators.Stats.cmhTest(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("text").isNotNull &&
          col("n_chars").isNotNull && col("doc_id").isNotNull)
        .select(
          when(col("doc_id") % 3 === 0, lit("cohort_a"))
            .otherwise(lit("cohort_b")).as("cohort"),
          col("lang"), col("n_chars"), col("text")),
      "cohort", "lang",
      (col("n_chars") > 300).cast("long"),
      col("text").contains("the").cast("long"),
      critical = 3.8415)
      .select(col("grp").as("cohort"), col("n_strata"), col("num"),
        col("var"), col("chi2"), col("significant"))

  val q267_oracle: String =
    """WITH RECURSIVE
       u AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 'cohort_a'
             ELSE 'cohort_b' END AS grp, lang AS s,
           CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS va,
           CASE WHEN contains(text, 'the') THEN 1 ELSE 0 END AS su
         FROM documents
         WHERE lang IS NOT NULL AND text IS NOT NULL
           AND n_chars IS NOT NULL AND doc_id IS NOT NULL),
       a AS (SELECT grp, s,
           sum(CASE WHEN va = 0 AND su = 0 THEN 1 ELSE 0 END) AS n00,
           sum(CASE WHEN va = 0 AND su = 1 THEN 1 ELSE 0 END) AS n01,
           sum(CASE WHEN va = 1 AND su = 0 THEN 1 ELSE 0 END) AS n10,
           sum(CASE WHEN va = 1 AND su = 1 THEN 1 ELSE 0 END) AS n11
         FROM u GROUP BY 1, 2),
       t AS (SELECT grp, s, n11, n00 + n01 + n10 + n11 AS n,
           n10 + n11 AS n1, n00 + n01 AS n0,
           n01 + n11 AS m1, n00 + n10 AS m0
         FROM a),
       f AS (SELECT grp, s,
           CAST(CAST(n11 AS HUGEINT) * n - CAST(n1 AS HUGEINT) * m1
             AS DOUBLE) / CAST(n AS DOUBLE) AS tn,
           CAST(CAST(n1 AS HUGEINT) * n0 * m1 * m0 AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n * (n - 1) AS DOUBLE) AS tv,
           row_number() OVER (PARTITION BY grp ORDER BY s) AS i
         FROM t WHERE n >= 2 AND n1 > 0 AND n0 > 0),
       cnt AS (SELECT grp, count(*) AS c FROM f GROUP BY 1),
       r AS (SELECT grp, 0 AS i, CAST(0 AS DOUBLE) AS n,
             CAST(0 AS DOUBLE) AS v
           FROM cnt
         UNION ALL
         SELECT f.grp, f.i, r.n + f.tn, r.v + f.tv
         FROM r JOIN f ON f.grp = r.grp AND f.i = r.i + 1)
       SELECT r.grp AS cohort, CAST(cnt.c AS BIGINT) AS n_strata,
         r.n AS num, r.v AS var,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v END AS chi2,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v > 3.8415 END
           AS significant
       FROM r JOIN cnt ON cnt.grp = r.grp AND r.i = cnt.c"""

  /** q268: log-rank test ([[graft.operators.Survival.logRank]]) —
    * per lang, do the two residue arms' survival curves (q266's
    * durations and censoring) differ? The hypergeometric O−E and
    * variance terms are one-division-exact per pooled event time, and
    * the cross-time sums are the same ordered fold as q267 — the
    * whole test gates hash-exact. */
  val q268_logrank: Q = (s, d) =>
    graft.operators.Survival.logRank(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("n_chars DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), critical = 3.8415)
      .select(col("grp").as("lang"), col("n_times"), col("num"),
        col("var"), col("chi2"), col("significant"))

  val q268_oracle: String =
    """WITH RECURSIVE
       b AS (SELECT lang AS grp, n_chars // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, t,
           CAST(CAST(d1 AS HUGEINT) * nt - CAST(dt AS HUGEINT) * n1t
             AS DOUBLE) / CAST(nt AS DOUBLE) AS tn,
           CAST(CAST(dt AS HUGEINT) * n1t * (nt - n1t) * (nt - dt)
             AS DOUBLE)
             / CAST(CAST(nt AS HUGEINT) * nt * (nt - 1) AS DOUBLE)
             AS tv,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       cnt AS (SELECT grp, count(*) AS c FROM f GROUP BY 1),
       r AS (SELECT grp, 0 AS i, CAST(0 AS DOUBLE) AS n,
             CAST(0 AS DOUBLE) AS v
           FROM cnt
         UNION ALL
         SELECT f.grp, f.i, r.n + f.tn, r.v + f.tv
         FROM r JOIN f ON f.grp = r.grp AND f.i = r.i + 1)
       SELECT r.grp AS lang, CAST(cnt.c AS BIGINT) AS n_times,
         r.n AS num, r.v AS var,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v END AS chi2,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v > 3.8415 END
           AS significant
       FROM r JOIN cnt ON cnt.grp = r.grp AND r.i = cnt.c"""

  /** q269: Breslow-weighted log-rank
    * ([[graft.operators.Survival.logRankBreslow]]) — q268 with
    * wₜ = nₜ (early-difference emphasis): the pooled numerator
    * becomes an exact order-free integer sum; only the variance rides
    * the q267 ordered fold. */
  val q269_logrank_breslow: Q = (s, d) =>
    graft.operators.Survival.logRankBreslow(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("n_chars DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), critical = 3.8415)
      .select(col("grp").as("lang"), col("n_times"), col("num"),
        col("var"), col("chi2"), col("significant"))

  val q269_oracle: String =
    """WITH RECURSIVE
       b AS (SELECT lang AS grp, n_chars // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, t,
           CAST(d1 AS HUGEINT) * nt - CAST(dt AS HUGEINT) * n1t AS tn,
           CAST(CAST(dt AS HUGEINT) * n1t * (nt - n1t) * (nt - dt)
             AS DOUBLE) / CAST(nt - 1 AS DOUBLE) AS tv,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       agg AS (SELECT grp, count(*) AS c,
           CAST(sum(tn) AS DOUBLE) AS num FROM f GROUP BY 1),
       r AS (SELECT grp, 0 AS i, CAST(0 AS DOUBLE) AS v FROM agg
         UNION ALL
         SELECT f.grp, f.i, r.v + f.tv
         FROM r JOIN f ON f.grp = r.grp AND f.i = r.i + 1)
       SELECT r.grp AS lang, CAST(agg.c AS BIGINT) AS n_times,
         agg.num, r.v AS var,
         CASE WHEN r.v > 0 THEN agg.num * agg.num / r.v END AS chi2,
         CASE WHEN r.v > 0 THEN agg.num * agg.num / r.v > 3.8415 END
           AS significant
       FROM r JOIN agg ON agg.grp = r.grp AND r.i = agg.c"""

  /** q270: Peto-Prentice weighted log-rank
    * ([[graft.operators.Survival.logRankPetoPrentice]]) — q268 with
    * wₜ = S̃(t), the Prentice-modified survival estimate riding the
    * Kaplan-Meier 2^-40 floor fold: the censoring-robust
    * early-emphasis test completing the w=1 / w=nₜ / w=S̃ menu. One
    * recursive CTE replays fp, num and var bit-for-bit. */
  val q270_logrank_peto: Q = (s, d) =>
    graft.operators.Survival.logRankPetoPrentice(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("n_chars DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), critical = 3.8415)
      .select(col("grp").as("lang"), col("n_times"), col("num"),
        col("var"), col("chi2"), col("significant"))

  val q270_oracle: String =
    """WITH RECURSIVE
       b AS (SELECT lang AS grp, n_chars // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, t, CAST(d1 AS BIGINT) AS d1,
           CAST(dt AS BIGINT) AS dt, CAST(n1t AS BIGINT) AS n1t,
           CAST(nt AS BIGINT) AS nt,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       cnt AS (SELECT grp, count(*) AS c FROM f GROUP BY 1),
       r AS (SELECT grp, 0 AS i, CAST(1099511627776 AS BIGINT) AS fp,
             CAST(0 AS DOUBLE) AS n, CAST(0 AS DOUBLE) AS v
           FROM cnt
         UNION ALL
         SELECT f.grp, f.i,
           (r.fp * (f.nt - f.dt + 1)) // (f.nt + 1),
           r.n + (CAST((r.fp * (f.nt - f.dt + 1)) // (f.nt + 1)
                    AS DOUBLE) / CAST(1099511627776 AS DOUBLE)) *
               (CAST(CAST(f.d1 AS HUGEINT) * f.nt
                   - CAST(f.dt AS HUGEINT) * f.n1t AS DOUBLE)
                 / CAST(f.nt AS DOUBLE)),
           r.v + ((CAST((r.fp * (f.nt - f.dt + 1)) // (f.nt + 1)
                     AS DOUBLE) / CAST(1099511627776 AS DOUBLE))
                  * (CAST((r.fp * (f.nt - f.dt + 1)) // (f.nt + 1)
                       AS DOUBLE) / CAST(1099511627776 AS DOUBLE))) *
               (CAST(CAST(f.dt AS HUGEINT) * f.n1t * (f.nt - f.n1t)
                   * (f.nt - f.dt) AS DOUBLE)
                 / CAST(CAST(f.nt AS HUGEINT) * f.nt * (f.nt - 1)
                     AS DOUBLE))
         FROM r JOIN f ON f.grp = r.grp AND f.i = r.i + 1)
       SELECT r.grp AS lang, CAST(cnt.c AS BIGINT) AS n_times,
         r.n AS num, r.v AS var,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v END AS chi2,
         CASE WHEN r.v > 0 THEN r.n * r.n / r.v > 3.8415 END
           AS significant
       FROM r JOIN cnt ON cnt.grp = r.grp AND r.i = cnt.c"""

  /** q271: group-sequential O'Brien-Fleming testing
    * ([[graft.operators.Stats.groupSequential]]) — the classic
    * planned-interim-analysis design next to q264's always-valid
    * peeking: per lang, metric n_chars + 4·residue (the residue
    * doubles as the treatment signal, scaled so the latched stop
    * actually fires mid-sequence at sf0.01), arms split on
    * residue < 50, five equally-spaced balanced looks at
    * 20/40/60/80/100 units per arm. The OBF boundary is FLAT on the
    * partial-sum scale — ⌈c(5,α)²·2σ²·n_K⌉, one literal both engines
    * compare the exact integer Δ² against — so per-look rejections
    * and the latched stop decision gate hash-exact. */
  val q271_group_sequential: Q = (s, d) =>
    graft.operators.Stats.groupSequential(
      Tables.documents(s, d)
        .withColumn("met", col("n_chars") + (col("doc_id") % 101) * 4),
      "lang", (col("doc_id") % 101 < 50).cast("int"),
      "met", "doc_id", "doc_id",
      looks = gsLooks, sigma2 = GsSigma2, alphaPermille = 50)
      .select(col("grp").as("lang"), col("look"), col("delta"),
        col("rejected"), col("rejected_any"))

  private val gsLooks = Seq(20L, 40L, 60L, 80L, 100L)
  private val GsSigma2 = 90000.0

  val q271_oracle: String = {
    import graft.operators.Stats
    val wCols = gsLooks.indices.map { i =>
      val n = gsLooks(i)
      s"""sum(CASE WHEN arm = 1 AND rk <= $n THEN v END) AS st_$i,
         count(CASE WHEN arm = 1 AND rk <= $n THEN 1 END) AS ct_$i,
         sum(CASE WHEN arm = 0 AND rk <= $n THEN v END) AS sc_$i,
         count(CASE WHEN arm = 0 AND rk <= $n THEN 1 END) AS cc_$i"""
    }.mkString(",\n         ")
    val branches = gsLooks.indices.map { i =>
      val n = gsLooks(i)
      val c = Stats.gsThreshold(gsLooks.size, n, gsLooks.max, GsSigma2,
        alphaPermille = 50, pocock = false).toString
      s"""SELECT grp, CAST($n AS BIGINT) AS look,
           CAST(st_$i - sc_$i AS BIGINT) AS delta,
           ((st_$i - sc_$i) * (st_$i - sc_$i) >= $c) AS rejected
         FROM w WHERE ct_$i = $n AND cc_$i = $n"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH b AS (SELECT lang AS grp,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm,
           n_chars + (doc_id % 101) * 4 AS v, doc_id AS i
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       r AS (SELECT grp, arm, v, row_number() OVER (
           PARTITION BY grp, arm ORDER BY i, i) AS rk FROM b),
       w AS (SELECT grp,
         $wCols
         FROM r GROUP BY grp),
       d AS ($branches)
       SELECT grp AS lang, look, delta, rejected,
         (max(CASE WHEN rejected THEN 1 ELSE 0 END) OVER (
            PARTITION BY grp ORDER BY look) = 1) AS rejected_any
       FROM d"""
  }

  /** q272: Cox proportional hazards
    * ([[graft.operators.Survival.coxTwoArm]]) — per lang, the log
    * hazard ratio of the q268 arms on residue-shifted durations
    * (duration = (n_chars + 3·residue) DIV 10, so arm 1's smaller
    * residues mean genuinely earlier failures and β > 0 everywhere by
    * construction). Both engines run the IDENTICAL fixed 8-iteration
    * Newton walk over the life table (Spark: one ordered fold; DuckDB:
    * a recursive CTE stepping iterations × event times) — but e^β of a
    * data-dependent β is libm-vs-JVM ulp territory, so the gate reads
    * the q77/q94/q98 RANK surface: exact life-table integers, the
    * hazard direction, and the cross-lang β rank (fixture β gaps
    * measured ≥ 2e-3, nine orders above the ~1e-13 cross-engine
    * drift; SurvivalSpec cross-checks β itself against an independent
    * golden-section maximizer). */
  val q272_cox_hazard: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cox = graft.operators.Survival.coxTwoArm(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("(n_chars + (doc_id % 101) * 3) DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), iters = 8)
    cox.select(col("grp").as("lang"), col("n_times"), col("events"),
      (col("beta") > 0).as("direction"),
      row_number().over(Window.orderBy(col("beta").desc, col("grp")))
        .cast("long").as("beta_rank"))
  }

  val q272_oracle: String = {
    // the identical Newton step, spelled once: SQL lambdas/CTEs have
    // no let-binding, so the subexpressions interpolate repeatedly
    val a1 = "(CAST(f.n1t AS DOUBLE) * exp(w.bta))"
    val p = s"($a1 / (CAST(f.nt - f.n1t AS DOUBLE) + $a1))"
    val du = s"(CAST(f.d1 AS DOUBLE) - CAST(f.dt AS DOUBLE) * $p)"
    val dI = s"(CAST(f.dt AS DOUBLE) * $p * (1.0 - $p))"
    val atEnd = "((w.s + 1) % cnt.k) = cnt.k - 1"
    val newB = s"""CASE WHEN w.ff + $dI > CAST(0 AS DOUBLE)
        THEN greatest(CAST(-30 AS DOUBLE), least(CAST(30 AS DOUBLE),
          w.bta + (w.u + $du) / (w.ff + $dI)))
        ELSE w.bta END"""
    s"""WITH RECURSIVE
       b AS (SELECT lang AS grp,
           (n_chars + (doc_id % 101) * 3) // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, t, CAST(d1 AS BIGINT) AS d1,
           CAST(dt AS BIGINT) AS dt, CAST(n1t AS BIGINT) AS n1t,
           CAST(nt AS BIGINT) AS nt,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       cnt AS (SELECT grp, count(*) AS k,
           CAST(sum(dt) AS BIGINT) AS events FROM f GROUP BY 1),
       w AS (SELECT grp, -1 AS s, CAST(0 AS DOUBLE) AS bta,
             CAST(0 AS DOUBLE) AS u, CAST(0 AS DOUBLE) AS ff
           FROM cnt
         UNION ALL
         SELECT w.grp, w.s + 1,
           CASE WHEN $atEnd THEN $newB ELSE w.bta END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.u + $du END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.ff + $dI END
         FROM w
         JOIN cnt ON cnt.grp = w.grp
         JOIN f ON f.grp = w.grp AND f.i = ((w.s + 1) % cnt.k) + 1
         WHERE w.s + 1 < 8 * cnt.k),
       fin AS (SELECT w.grp, w.bta
         FROM w JOIN cnt ON cnt.grp = w.grp AND w.s = 8 * cnt.k - 1)
       SELECT fin.grp AS lang, CAST(cnt.k AS BIGINT) AS n_times,
         cnt.events, (fin.bta > 0) AS direction,
         CAST(row_number() OVER (ORDER BY fin.bta DESC, fin.grp)
           AS BIGINT) AS beta_rank
       FROM fin JOIN cnt ON cnt.grp = fin.grp"""
  }

  /** q273: per-group weighted least squares
    * ([[graft.operators.Stats.linearFit]]) — per lang, the trend line
    * y = n_chars + 3·residue against x = residue with weights
    * w = doc_id%7 + 1 (slope ≈ 3 by construction, jittered by the
    * n_chars–residue mix). Every normal-equation sum is an exact
    * order-free 128-bit integer, so slope/intercept/r² are fixed IEEE
    * trees both engines evaluate identically — the EXACT regression
    * readout the float-summation wall normally denies, with NO fold
    * needed at all. */
  val q273_linear_fit: Q = (s, d) =>
    graft.operators.Stats.linearFit(
      Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .select(col("lang"),
          (col("doc_id") % 101).as("x"),
          (col("n_chars") + (col("doc_id") % 101) * 3).as("y"),
          (col("doc_id") % 7 + 1).as("w")),
      "lang", "x", "y", weightCol = Some("w"))
      .select(col("grp").as("lang"), col("n"), col("w_total"),
        col("slope"), col("intercept"), col("r2"))

  val q273_oracle: String =
    """WITH b AS (SELECT lang AS grp,
           doc_id % 101 AS x,
           n_chars + (doc_id % 101) * 3 AS y,
           doc_id % 7 + 1 AS w
         FROM documents
         WHERE doc_id IS NOT NULL AND lang IS NOT NULL
           AND n_chars IS NOT NULL),
       a AS (SELECT grp, count(*) AS n,
           sum(CAST(w AS HUGEINT)) AS sw,
           sum(CAST(w AS HUGEINT) * x) AS sx,
           sum(CAST(w AS HUGEINT) * y) AS sy,
           sum(CAST(w AS HUGEINT) * x * x) AS sxx,
           sum(CAST(w AS HUGEINT) * y * y) AS syy,
           sum(CAST(w AS HUGEINT) * x * y) AS sxy
         FROM b GROUP BY 1)
       SELECT grp AS lang, CAST(n AS BIGINT) AS n,
         CAST(sw AS BIGINT) AS w_total,
         CASE WHEN sw * sxx - sx * sx > 0 THEN
           CAST(sw * sxy - sx * sy AS DOUBLE)
             / CAST(sw * sxx - sx * sx AS DOUBLE) END AS slope,
         CASE WHEN sw * sxx - sx * sx > 0 THEN
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(sw * sxx - sx * sx AS DOUBLE) END AS intercept,
         CASE WHEN sw * sxx - sx * sx > 0
             AND sw * syy - sy * sy > 0 THEN
           (CAST(sw * sxy - sx * sy AS DOUBLE)
              * CAST(sw * sxy - sx * sy AS DOUBLE))
             / (CAST(sw * sxx - sx * sx AS DOUBLE)
                  * CAST(sw * syy - sy * sy AS DOUBLE)) END AS r2
       FROM a"""

  /** q274: stratified Cox proportional hazards
    * ([[graft.operators.Survival.coxTwoArmStratified]]) — q272 with
    * per-SOURCE baseline hazards and a shared β: the confounder
    * control when baseline risk differs by stratum (sources have
    * different length profiles) but the treatment effect is common.
    * Same fixed Newton walk over rows sorted (stratum, time), same
    * recursive-CTE replay, same rank-surface gate (gaps re-measured
    * ≥ 2e-3 on this fixture). */
  val q274_cox_stratified: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cox = graft.operators.Survival.coxTwoArmStratified(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("source").isNotNull &&
          col("n_chars").isNotNull && col("doc_id").isNotNull)
        .select(col("lang"), col("source"),
          expr("(n_chars + (doc_id % 101) * 3) DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "source", "t", "e", col("arm"), iters = 8)
    cox.select(col("grp").as("lang"), col("n_times"), col("events"),
      (col("beta") > 0).as("direction"),
      row_number().over(Window.orderBy(col("beta").desc, col("grp")))
        .cast("long").as("beta_rank"))
  }

  val q274_oracle: String = {
    val a1 = "(CAST(f.n1t AS DOUBLE) * exp(w.bta))"
    val p = s"($a1 / (CAST(f.nt - f.n1t AS DOUBLE) + $a1))"
    val du = s"(CAST(f.d1 AS DOUBLE) - CAST(f.dt AS DOUBLE) * $p)"
    val dI = s"(CAST(f.dt AS DOUBLE) * $p * (1.0 - $p))"
    val atEnd = "((w.s + 1) % cnt.k) = cnt.k - 1"
    val newB = s"""CASE WHEN w.ff + $dI > CAST(0 AS DOUBLE)
        THEN greatest(CAST(-30 AS DOUBLE), least(CAST(30 AS DOUBLE),
          w.bta + (w.u + $du) / (w.ff + $dI)))
        ELSE w.bta END"""
    s"""WITH RECURSIVE
       b AS (SELECT lang AS grp, source AS st,
           (n_chars + (doc_id % 101) * 3) // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND source IS NOT NULL
           AND n_chars IS NOT NULL AND doc_id IS NOT NULL),
       c AS (SELECT grp, st, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2, 3),
       rk AS (SELECT grp, st, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp, st)
             - coalesce(sum(m1) OVER (PARTITION BY grp, st ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp, st)
             - coalesce(sum(m) OVER (PARTITION BY grp, st ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, st, t, CAST(d1 AS BIGINT) AS d1,
           CAST(dt AS BIGINT) AS dt, CAST(n1t AS BIGINT) AS n1t,
           CAST(nt AS BIGINT) AS nt,
           row_number() OVER (PARTITION BY grp ORDER BY st, t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       cnt AS (SELECT grp, count(*) AS k,
           CAST(sum(dt) AS BIGINT) AS events FROM f GROUP BY 1),
       w AS (SELECT grp, -1 AS s, CAST(0 AS DOUBLE) AS bta,
             CAST(0 AS DOUBLE) AS u, CAST(0 AS DOUBLE) AS ff
           FROM cnt
         UNION ALL
         SELECT w.grp, w.s + 1,
           CASE WHEN $atEnd THEN $newB ELSE w.bta END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.u + $du END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.ff + $dI END
         FROM w
         JOIN cnt ON cnt.grp = w.grp
         JOIN f ON f.grp = w.grp AND f.i = ((w.s + 1) % cnt.k) + 1
         WHERE w.s + 1 < 8 * cnt.k),
       fin AS (SELECT w.grp, w.bta
         FROM w JOIN cnt ON cnt.grp = w.grp AND w.s = 8 * cnt.k - 1)
       SELECT fin.grp AS lang, CAST(cnt.k AS BIGINT) AS n_times,
         cnt.events, (fin.bta > 0) AS direction,
         CAST(row_number() OVER (ORDER BY fin.bta DESC, fin.grp)
           AS BIGINT) AS beta_rank
       FROM fin JOIN cnt ON cnt.grp = fin.grp"""
  }

  /** q275: sequential A/B testing for a RATIO metric
    * ([[graft.operators.Stats.msprtRatio]], delta-method
    * linearization per Deng-Knoblich-Lu KDD 2018 over the
    * Johari-Koomen-Pekelis-Walsh mSPRT) — per lang, the ratio
    * chars-per-session with numerator n_chars and denominator
    * (doc_id % 31) + 1, arms on residue < 50, balanced looks at
    * 8/16/32/64/100 units per arm in doc_id order. The cross-
    * multiplied boundary test ((StXc−ScXt)(Xt+Xc))² ≥ C(n,α)(2XtXc)²
    * is exact integer arithmetic against the SAME literal mixture
    * boundaries in both engines, so rejections, the monotone
    * always-valid decision, and the ladder-quantized always-valid p
    * gate hash-exact — completing the sequential family next to
    * q264 (frozen-θ mean mSPRT) and q271 (group-sequential). */
  val q275_msprt_ratio: Q = (s, d) =>
    graft.operators.Stats.msprtRatio(
      Tables.documents(s, d)
        .withColumn("den", col("doc_id") % 31 + 1),
      "lang", (col("doc_id") % 101 < 50).cast("int"),
      "n_chars", "den", "doc_id", "doc_id",
      looks = msprtLooks, sigma2 = RatioSigma2, tau2 = RatioTau2,
      alphaPermille = 50)
      .select(col("grp").as("lang"), col("look"), col("delta_num"),
        col("rejected"), col("rejected_any"), col("av_p_permille"))

  private val RatioSigma2 = 10000.0
  private val RatioTau2 = 10000.0

  /** q276: per-group multiple regression with two integer covariates
    * ([[graft.operators.Stats.multiFit]]) — per lang, the plane
    * y = n_chars + 3·x1 − 2·x2 against x1 = doc_id%101,
    * x2 = doc_id%53 with weights doc_id%7 + 1 (b1 ≈ 3, b2 ≈ −2 by
    * construction, jittered by the n_chars–residue mix). Every Gram
    * entry is an exact 128-bit integer, every Cramer determinant a
    * product of three such sums (guarded loudly against the 38-digit
    * envelope), so b0/b1/b2/r² are fixed IEEE trees both engines
    * evaluate identically — exact MULTIPLE regression, no fold. */
  val q276_multi_fit: Q = (s, d) =>
    graft.operators.Stats.multiFit(
      Tables.documents(s, d)
        .filter(col("doc_id").isNotNull)
        .select(col("lang"),
          (col("doc_id") % 101).as("x1"),
          (col("doc_id") % 53).as("x2"),
          (col("n_chars") + (col("doc_id") % 101) * 3 -
            (col("doc_id") % 53) * 2).as("y"),
          (col("doc_id") % 7 + 1).as("w")),
      "lang", "x1", "x2", "y", weightCol = Some("w"))
      .select(col("grp").as("lang"), col("n"), col("w_total"),
        col("b0"), col("b1"), col("b2"), col("r2"))

  val q276_oracle: String = {
    val m11 = "(s11 * s22 - s12 * s12)"
    val dD = s"(sw * $m11 - sx1 * (sx1 * s22 - s12 * sx2) " +
      "+ sx2 * (sx1 * s12 - s11 * sx2))"
    val d0 = s"(sy * $m11 - sx1 * (s1y * s22 - s12 * s2y) " +
      "+ sx2 * (s1y * s12 - s11 * s2y))"
    val d1 = "(sw * (s1y * s22 - s12 * s2y) " +
      "- sy * (sx1 * s22 - s12 * sx2) + sx2 * (sx1 * s2y - s1y * sx2))"
    val d2 = "(sw * (s11 * s2y - s1y * s12) " +
      "- sx1 * (sx1 * s2y - s1y * sx2) + sy * (sx1 * s12 - s11 * sx2))"
    val e = s"(syy * $dD - (sy * $d0 + s1y * $d1 + s2y * $d2))"
    val sst = "(sw * syy - sy * sy)"
    s"""WITH b AS (SELECT lang AS grp,
           doc_id % 101 AS x1, doc_id % 53 AS x2,
           n_chars + (doc_id % 101) * 3 - (doc_id % 53) * 2 AS y,
           doc_id % 7 + 1 AS w
         FROM documents
         WHERE doc_id IS NOT NULL AND lang IS NOT NULL
           AND n_chars IS NOT NULL),
       a AS (SELECT grp, count(*) AS n,
           sum(CAST(w AS HUGEINT)) AS sw,
           sum(CAST(w AS HUGEINT) * x1) AS sx1,
           sum(CAST(w AS HUGEINT) * x2) AS sx2,
           sum(CAST(w AS HUGEINT) * y) AS sy,
           sum(CAST(w AS HUGEINT) * x1 * x1) AS s11,
           sum(CAST(w AS HUGEINT) * x1 * x2) AS s12,
           sum(CAST(w AS HUGEINT) * x2 * x2) AS s22,
           sum(CAST(w AS HUGEINT) * x1 * y) AS s1y,
           sum(CAST(w AS HUGEINT) * x2 * y) AS s2y,
           sum(CAST(w AS HUGEINT) * y * y) AS syy
         FROM b GROUP BY 1)
       SELECT grp AS lang, CAST(n AS BIGINT) AS n,
         CAST(sw AS BIGINT) AS w_total,
         CASE WHEN $dD > 0 THEN
           CAST($d0 AS DOUBLE) / CAST($dD AS DOUBLE) END AS b0,
         CASE WHEN $dD > 0 THEN
           CAST($d1 AS DOUBLE) / CAST($dD AS DOUBLE) END AS b1,
         CASE WHEN $dD > 0 THEN
           CAST($d2 AS DOUBLE) / CAST($dD AS DOUBLE) END AS b2,
         CASE WHEN $dD > 0 AND $sst > 0 THEN
           CAST(1.0 AS DOUBLE) - CAST($e AS DOUBLE)
             * CAST(CAST(sw AS BIGINT) AS DOUBLE)
             / (CAST($dD AS DOUBLE) * CAST($sst AS DOUBLE)) END AS r2
       FROM a"""
  }

  val q275_oracle: String = {
    import graft.operators.Stats
    def c(n: Long, a: Int): String =
      Stats.msprtThreshold(n, RatioSigma2, RatioTau2, a).toString
    val wCols = msprtLooks.indices.map { i =>
      val n = msprtLooks(i)
      s"""sum(CASE WHEN arm = 1 AND rk <= $n THEN nu END) AS st_$i,
         sum(CASE WHEN arm = 1 AND rk <= $n THEN de END) AS xt_$i,
         count(CASE WHEN arm = 1 AND rk <= $n THEN 1 END) AS ct_$i,
         sum(CASE WHEN arm = 0 AND rk <= $n THEN nu END) AS sc_$i,
         sum(CASE WHEN arm = 0 AND rk <= $n THEN de END) AS xc_$i,
         count(CASE WHEN arm = 0 AND rk <= $n THEN 1 END) AS cc_$i"""
    }.mkString(",\n         ")
    val branches = msprtLooks.indices.map { i =>
      val n = msprtLooks(i)
      val a = s"(st_$i * xc_$i - sc_$i * xt_$i)"
      val p = s"($a * (xt_$i + xc_$i))"
      val q = s"(2 * xt_$i * xc_$i)"
      val ladder = Stats.MsprtLadder.map(al =>
        s"WHEN $p * $p >= ${c(n, al)} * ($q * $q) THEN $al")
        .mkString(" ")
      s"""SELECT grp, CAST($n AS BIGINT) AS look,
           CAST($a AS BIGINT) AS delta_num,
           ($p * $p >= ${c(n, 50)} * ($q * $q)) AS rejected,
           CASE $ladder ELSE 1000 END AS p_now
         FROM w WHERE ct_$i = $n AND cc_$i = $n
           AND xt_$i > 0 AND xc_$i > 0"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH b AS (SELECT lang AS grp,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm,
           CAST(n_chars AS HUGEINT) AS nu,
           CAST((doc_id % 31) + 1 AS HUGEINT) AS de, doc_id AS i
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       r AS (SELECT grp, arm, nu, de, row_number() OVER (
           PARTITION BY grp, arm ORDER BY i, i) AS rk FROM b),
       w AS (SELECT grp,
         $wCols
         FROM r GROUP BY grp),
       d AS ($branches)
       SELECT grp AS lang, look, delta_num, rejected,
         (max(CASE WHEN rejected THEN 1 ELSE 0 END) OVER (
            PARTITION BY grp ORDER BY look) = 1) AS rejected_any,
         CAST(min(p_now) OVER (PARTITION BY grp ORDER BY look)
           AS BIGINT) AS av_p_permille
       FROM d"""
  }

  /** q277: Cox proportional hazards with EFRON tie handling
    * ([[graft.operators.Survival.coxTwoArmEfron]]) — the q272 design
    * on a deliberately TIE-HEAVY surface: durations coarsened to
    * DIV 100 (4-9 distinct times per lang at sf0.1, dozens of tied
    * deaths each — exactly where Breslow's same-risk-set
    * approximation biases β toward 0 and R's coxph defaults to
    * Efron), corpus thinned deterministically (doc_id % 13 = 0) so
    * the tie-expansion fold grain (= events) stays inside the 4096
    * envelope at every SF including the 10× scale corpus. Both
    * engines walk the IDENTICAL (time, tie-index) sub-row sequence —
    * Spark: one ordered fold; DuckDB: a recursive CTE over the
    * unnest(range(dt))-expanded life table — and the gate reads the
    * q272 rank surface (fixture β gaps ≥ 5.6e-2 across SFs, ulp-proof
    * by ten orders). A lang whose thinned life table retains nothing
    * (de at sf0.01) is absent from BOTH engines — row-set
    * load-bearing. */
  val q277_cox_efron: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cox = graft.operators.Survival.coxTwoArmEfron(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull && col("doc_id") % 13 === 0)
        .select(col("lang"),
          expr("(n_chars + (doc_id % 101) * 3) DIV 100").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), iters = 8)
    cox.select(col("grp").as("lang"), col("n_times"), col("events"),
      (col("beta") > 0).as("direction"),
      row_number().over(Window.orderBy(col("beta").desc, col("grp")))
        .cast("long").as("beta_rank"))
  }

  val q277_oracle: String = {
    val fr = "(CAST(f.j AS DOUBLE) / CAST(f.dt AS DOUBLE))"
    val a1 = s"((CAST(f.n1t AS DOUBLE) - $fr * CAST(f.d1 AS DOUBLE))" +
      " * exp(w.bta))"
    val a0 = s"(CAST(f.nt - f.n1t AS DOUBLE) - $fr * " +
      "CAST(f.dt - f.d1 AS DOUBLE))"
    val p = s"($a1 / ($a0 + $a1))"
    val du = s"(CAST(f.d1 AS DOUBLE) / CAST(f.dt AS DOUBLE) - $p)"
    val dI = s"($p * (1.0 - $p))"
    val atEnd = "((w.s + 1) % cnt.k) = cnt.k - 1"
    val newB = s"""CASE WHEN w.ff + $dI > CAST(0 AS DOUBLE)
        THEN greatest(CAST(-30 AS DOUBLE), least(CAST(30 AS DOUBLE),
          w.bta + (w.u + $du) / (w.ff + $dI)))
        ELSE w.bta END"""
    s"""WITH RECURSIVE
       b AS (SELECT lang AS grp,
           (n_chars + (doc_id % 101) * 3) // 100 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL AND doc_id % 13 = 0),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       fl AS (SELECT grp, t, CAST(d1 AS BIGINT) AS d1,
           CAST(dt AS BIGINT) AS dt, CAST(n1t AS BIGINT) AS n1t,
           CAST(nt AS BIGINT) AS nt
         FROM rk WHERE dt > 0 AND nt >= 2),
       fx AS (SELECT grp, t, unnest(range(0, dt)) AS j,
           d1, dt, n1t, nt
         FROM fl),
       f AS (SELECT grp, t, j, d1, dt, n1t, nt,
           row_number() OVER (PARTITION BY grp ORDER BY t, j) AS i
         FROM fx),
       cnt AS (SELECT grp, count(*) AS k,
           CAST(count(*) AS BIGINT) AS events FROM f GROUP BY 1),
       w AS (SELECT grp, -1 AS s, CAST(0 AS DOUBLE) AS bta,
             CAST(0 AS DOUBLE) AS u, CAST(0 AS DOUBLE) AS ff
           FROM cnt
         UNION ALL
         SELECT w.grp, w.s + 1,
           CASE WHEN $atEnd THEN $newB ELSE w.bta END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.u + $du END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.ff + $dI END
         FROM w
         JOIN cnt ON cnt.grp = w.grp
         JOIN f ON f.grp = w.grp AND f.i = ((w.s + 1) % cnt.k) + 1
         WHERE w.s + 1 < 8 * cnt.k),
       fin AS (SELECT w.grp, w.bta
         FROM w JOIN cnt ON cnt.grp = w.grp AND w.s = 8 * cnt.k - 1)
       SELECT fin.grp AS lang, CAST(cnt.k AS BIGINT) AS n_times,
         cnt.events, (fin.bta > 0) AS direction,
         CAST(row_number() OVER (ORDER BY fin.bta DESC, fin.grp)
           AS BIGINT) AS beta_rank
       FROM fin JOIN cnt ON cnt.grp = fin.grp"""
  }

  /** q278: Breslow baseline cumulative hazard
    * ([[graft.operators.Survival.breslowBaseline]]) — the absolute
    * survival readout over the q272 Cox fixture: Ĥ₀(t) accumulated on
    * the life-table grain under the fitted β̂, with Ŝ₀ = e^(−Ĥ₀).
    * Life-table integers (n_times, events) gate hash-exact; the
    * float surface gates as the q272 rank discipline — the cross-lang
    * rank of the final Ĥ₀ (fixture gaps ≥ 0.028) and the baseline
    * MEDIAN-survival time t_half = first t with Ŝ₀ < 0.5 (the
    * closest any Ŝ₀ sits to 0.5 on the fixture is 4.0e-4, eleven
    * orders above the ~1e-13 cross-engine e^β drift). */
  val q278_breslow_baseline: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val base = graft.operators.Survival.breslowBaseline(
      Tables.documents(s, d)
        .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
          col("doc_id").isNotNull)
        .select(col("lang"),
          expr("(n_chars + (doc_id % 101) * 3) DIV 10").as("t"),
          (col("doc_id") % 4 > 0).cast("long").as("e"),
          (col("doc_id") % 101 < 50).cast("int").as("arm")),
      "lang", "t", "e", col("arm"), iters = 8)
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_times"), sum(col("dt")).as("events"),
        max(col("h0")).as("__h0f"),
        min(when(col("s0") < 0.5, col("t"))).as("t_half"),
        max((col("beta") > 0).cast("int")).as("__dir"))
      .select(col("grp").as("lang"), col("n_times"), col("events"),
        col("t_half"), (col("__dir") === 1).as("direction"),
        row_number().over(Window.orderBy(col("__h0f").desc,
          col("grp"))).cast("long").as("h0_rank"))
  }

  val q278_oracle: String = {
    val a1 = "(CAST(f.n1t AS DOUBLE) * exp(w.bta))"
    val p = s"($a1 / (CAST(f.nt - f.n1t AS DOUBLE) + $a1))"
    val du = s"(CAST(f.d1 AS DOUBLE) - CAST(f.dt AS DOUBLE) * $p)"
    val dI = s"(CAST(f.dt AS DOUBLE) * $p * (1.0 - $p))"
    val atEnd = "((w.s + 1) % cnt.k) = cnt.k - 1"
    val newB = s"""CASE WHEN w.ff + $dI > CAST(0 AS DOUBLE)
        THEN greatest(CAST(-30 AS DOUBLE), least(CAST(30 AS DOUBLE),
          w.bta + (w.u + $du) / (w.ff + $dI)))
        ELSE w.bta END"""
    s"""WITH RECURSIVE
       b AS (SELECT lang AS grp,
           (n_chars + (doc_id % 101) * 3) // 10 AS t,
           CASE WHEN doc_id % 4 > 0 THEN 1 ELSE 0 END AS e,
           CASE WHEN doc_id % 101 < 50 THEN 1 ELSE 0 END AS arm
         FROM documents
         WHERE lang IS NOT NULL AND n_chars IS NOT NULL
           AND doc_id IS NOT NULL),
       c AS (SELECT grp, t,
           sum(CASE WHEN arm = 1 THEN e ELSE 0 END) AS d1,
           sum(e) AS dt,
           sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS m1,
           count(*) AS m
         FROM b GROUP BY 1, 2),
       rk AS (SELECT grp, t, d1, dt,
           sum(m1) OVER (PARTITION BY grp)
             - coalesce(sum(m1) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n1t,
           sum(m) OVER (PARTITION BY grp)
             - coalesce(sum(m) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS nt
         FROM c),
       f AS (SELECT grp, t, CAST(d1 AS BIGINT) AS d1,
           CAST(dt AS BIGINT) AS dt, CAST(n1t AS BIGINT) AS n1t,
           CAST(nt AS BIGINT) AS nt,
           row_number() OVER (PARTITION BY grp ORDER BY t) AS i
         FROM rk WHERE dt > 0 AND nt >= 2),
       cnt AS (SELECT grp, count(*) AS k,
           CAST(sum(dt) AS BIGINT) AS events FROM f GROUP BY 1),
       w AS (SELECT grp, -1 AS s, CAST(0 AS DOUBLE) AS bta,
             CAST(0 AS DOUBLE) AS u, CAST(0 AS DOUBLE) AS ff
           FROM cnt
         UNION ALL
         SELECT w.grp, w.s + 1,
           CASE WHEN $atEnd THEN $newB ELSE w.bta END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.u + $du END,
           CASE WHEN $atEnd THEN CAST(0 AS DOUBLE)
             ELSE w.ff + $dI END
         FROM w
         JOIN cnt ON cnt.grp = w.grp
         JOIN f ON f.grp = w.grp AND f.i = ((w.s + 1) % cnt.k) + 1
         WHERE w.s + 1 < 8 * cnt.k),
       fin AS (SELECT w.grp, w.bta
         FROM w JOIN cnt ON cnt.grp = w.grp AND w.s = 8 * cnt.k - 1),
       h AS (SELECT f.grp, f.t, f.dt, fin.bta,
           sum(CAST(f.dt AS DOUBLE)
               / (CAST(f.nt - f.n1t AS DOUBLE)
                  + CAST(f.n1t AS DOUBLE) * exp(fin.bta)))
             OVER (PARTITION BY f.grp ORDER BY f.t) AS h0
         FROM f JOIN fin ON fin.grp = f.grp),
       g AS (SELECT grp, count(*) AS n_times,
           CAST(sum(dt) AS BIGINT) AS events,
           max(h0) AS h0f,
           min(CASE WHEN exp(-h0) < 0.5 THEN t END) AS t_half,
           max(CASE WHEN bta > 0 THEN 1 ELSE 0 END) AS dir
         FROM h GROUP BY 1)
       SELECT grp AS lang, CAST(n_times AS BIGINT) AS n_times,
         events, CAST(t_half AS BIGINT) AS t_half,
         (dir = 1) AS direction,
         CAST(row_number() OVER (ORDER BY h0f DESC, grp)
           AS BIGINT) AS h0_rank
       FROM g"""
  }

  val all: Map[String, Q] = Map(
    "q278_breslow_baseline" -> q278_breslow_baseline,
    "q277_cox_efron" -> q277_cox_efron,
    "q276_multi_fit" -> q276_multi_fit,
    "q275_msprt_ratio" -> q275_msprt_ratio,
    "q274_cox_stratified" -> q274_cox_stratified,
    "q273_linear_fit" -> q273_linear_fit,
    "q272_cox_hazard" -> q272_cox_hazard,
    "q271_group_sequential" -> q271_group_sequential,
    "q270_logrank_peto" -> q270_logrank_peto,
    "q269_logrank_breslow" -> q269_logrank_breslow,
    "q268_logrank" -> q268_logrank,
    "q267_cmh" -> q267_cmh,
    "q266_kaplan_meier" -> q266_kaplan_meier,
    "q264_msprt" -> q264_msprt,
    "q263_top_share" -> q263_top_share,
    "q261_capture_recapture" -> q261_capture_recapture,
    "q259_wilson_ci" -> q259_wilson_ci,
    "q260_vocab_richness" -> q260_vocab_richness,
    "q258_table_profile" -> q258_table_profile,
    "q256_cuped" -> q256_cuped,
    "q255_effect_size" -> q255_effect_size,
    "q254_benford" -> q254_benford,
    "q253_mann_whitney" -> q253_mann_whitney,
    "q252_spearman" -> q252_spearman,
    "q251_bh_fdr" -> q251_bh_fdr,
    "q250_trimmed_mean" -> q250_trimmed_mean,
    "q249_moment_census" -> q249_moment_census,
    "q247_priority_sample" -> q247_priority_sample,
    "q248_priority_estimate" -> q248_priority_estimate,
    "q246_auc_signal" -> q246_auc_signal,
    "q244_bootstrap_median" -> q244_bootstrap_median,
    "q242_bootstrap_ratio" -> q242_bootstrap_ratio,
    "q240_bootstrap_ci" -> q240_bootstrap_ci,
    "q235_theta_joint" -> q235_theta_joint,
    "q230_hdr_quantiles" -> q230_hdr_quantiles,
    "q231_exact_quantiles" -> q231_exact_quantiles,
    "q232_hdr_merged" -> q232_hdr_merged,
    "q233_hdr_weighted" -> q233_hdr_weighted,
    "q228_theta_setops" -> q228_theta_setops,
    "q229_theta_merged" -> q229_theta_merged,
    "q226_krippendorff_interval" -> q226_krippendorff_interval,
    "q227_krippendorff_ordinal" -> q227_krippendorff_ordinal,
    "q224_theta_intersect" -> q224_theta_intersect,
    "q225_exact_intersect" -> q225_exact_intersect,
    "q222_sample_quotas" -> q222_sample_quotas,
    "q223_krippendorff_alpha" -> q223_krippendorff_alpha,
    "q214_calibration_apply" -> q214_calibration_apply,
    "q219_conformal_threshold" -> q219_conformal_threshold,
    "q220_fleiss_kappa" -> q220_fleiss_kappa,
    "q221_rbo_signals" -> q221_rbo_signals,
    "q213_ks_by_lang" -> q213_ks_by_lang,
    "q212_gini_mix" -> q212_gini_mix,
    "q211_ks_drift" -> q211_ks_drift,
    "q209_grouped_calibration" -> q209_grouped_calibration,
    "q204_isotonic_calibration" -> q204_isotonic_calibration,
    "q200_dispersion" -> q200_dispersion,
    "q201_langid_kappa" -> q201_langid_kappa,
    "q202_lexical_diversity" -> q202_lexical_diversity,
    "q199_vocab_growth" -> q199_vocab_growth,
    "q198_kn3_fluency" -> q198_kn3_fluency,
    "q196_pmi_collocations" -> q196_pmi_collocations,
    "q195_span_pairs" -> q195_span_pairs,
    "q194_dict_spans" -> q194_dict_spans,
    "q192_kn_fluency" -> q192_kn_fluency,
    "q190_keyness_drift" -> q190_keyness_drift,
    "q189_dict_tags" -> q189_dict_tags,
    "q185_weighted_sample" -> q185_weighted_sample,
    "q186_match_composition" -> q186_match_composition,
    "q188_budget_allocation" -> q188_budget_allocation,
    "q173_bpe_train" -> q173_bpe_train,
    "q178_token_spectrum" -> q178_token_spectrum,
    "q101_incremental_neardup" -> q101_incremental_neardup,
    "q98_dsir_rank" -> q98_dsir_rank,
    "q97_gopher_repetition" -> q97_gopher_repetition,
    "q96_priority_survivors" -> q96_priority_survivors,
    "q95_containment_pairs" -> q95_containment_pairs,
    "q94_lm_perplexity" -> q94_lm_perplexity,
    "q90_repeated_spans" -> q90_repeated_spans,
    "q91_span_scrub" -> q91_span_scrub,
    "q86_weighted_mix" -> q86_weighted_mix,
    "q84_chunk_tokens" -> q84_chunk_tokens,
    "q82_incremental_dedup" -> q82_incremental_dedup,
    "q112_incremental_dedup_large" -> q112_incremental_dedup_large,
    "q75_redact_pii" -> q75_redact_pii,
    "q77_bm25_topk" -> q77_bm25_topk,
    "q78_split_assign" -> q78_split_assign,
    "q73_pipeline" -> q73_pipeline,
    "q72_decontaminate" -> q72_decontaminate,
    "q70_sequence_pack" -> q70_sequence_pack,
    "q69_stratified_sample" -> q69_stratified_sample,
    "q67_term_freq" -> q67_term_freq,
    "q68_repetition" -> q68_repetition,
    "q66_neardup_components" -> q66_neardup_components,
    "q55_bpe_tokens" -> q55_bpe_tokens,
    "q26_token_stats" -> q26_token_stats,
    "q27_lang_profile" -> q27_lang_profile,
    "q28_quality_score" -> q28_quality_score,
    "q29_fingerprint_dedup" -> q29_fingerprint_dedup,
    "q30_jaccard_pairs" -> q30_jaccard_pairs,
    "q31_minhash_lsh_pairs" -> q31_minhash_lsh_pairs,
    "q106_normalized_neardup" -> q106_normalized_neardup,
    "q145_ppjoin_pairs" -> q145_ppjoin_pairs,
    "q146_sparse_cosine" -> q146_sparse_cosine,
    "q147_phrase_search" -> q147_phrase_search,
    "q148_bpe_pair_stats" -> q148_bpe_pair_stats,
    "q149_bpe_apply" -> q149_bpe_apply,
    "q151_threshold_sweep" -> q151_threshold_sweep,
    "q155_novelty_profile" -> q155_novelty_profile,
    "q157_token_pairs" -> q157_token_pairs,
    "q158_source_overlap" -> q158_source_overlap,
    "q162_bpe_fertility" -> q162_bpe_fertility,
    "q164_length_quantiles" -> q164_length_quantiles,
    "q167_cms_heavy" -> q167_cms_heavy,
    "q168_cms_merged" -> q168_cms_merged,
    "q170_robust_outliers" -> q170_robust_outliers,
    "q171_dedup_by_source" -> q171_dedup_by_source,
    "q172_quantile_normalize" -> q172_quantile_normalize,
    "q108_url_canon_dedup" -> q108_url_canon_dedup,
    "q109_html_extract" -> q109_html_extract,
    "q110_classifier_label" -> q110_classifier_label,
    "q111_clean_lines" -> q111_clean_lines,
    "q113_extract_links" -> q113_extract_links,
    "q114_domain_cap" -> q114_domain_cap,
    "q117_paragraph_dedup" -> q117_paragraph_dedup,
    "q126_incr_paragraph_dedup" -> q126_incr_paragraph_dedup,
    "q137_incr_paragraph_large" -> q137_incr_paragraph_large,
    "q130_dup_line_profile" -> q130_dup_line_profile,
    "q133_curation_funnel" -> q133_curation_funnel,
    "q134_sequence_packing" -> q134_sequence_packing,
    "q180_aligned_packing" -> q180_aligned_packing,
    "q183_temperature_mix" -> q183_temperature_mix,
    "q184_perplexity_buckets" -> q184_perplexity_buckets,
    "q135_token_budget" -> q135_token_budget,
    "q136_shuffled_packing" -> q136_shuffled_packing,
    "q138_boilerplate_ngrams" -> q138_boilerplate_ngrams,
    "q139_funnel_by_source" -> q139_funnel_by_source,
    "q142_char_stats" -> q142_char_stats,
    "q143_grouped_split" -> q143_grouped_split,
    "q122_winnow_fingerprints" -> q122_winnow_fingerprints,
    "q32_dedup_survivors" -> q32_dedup_survivors,
    "q33_simhash_pairs" -> q33_simhash_pairs,
    "q104_simhash_capped" -> q104_simhash_capped,
    "q34_rolling_fingerprint" -> q34_rolling_fingerprint,
    "q35_langid" -> q35_langid)

  val oracles: Map[String, String] = Map(
    "q278_breslow_baseline" -> q278_oracle,
    "q277_cox_efron" -> q277_oracle,
    "q276_multi_fit" -> q276_oracle,
    "q275_msprt_ratio" -> q275_oracle,
    "q274_cox_stratified" -> q274_oracle,
    "q273_linear_fit" -> q273_oracle,
    "q272_cox_hazard" -> q272_oracle,
    "q271_group_sequential" -> q271_oracle,
    "q270_logrank_peto" -> q270_oracle,
    "q269_logrank_breslow" -> q269_oracle,
    "q268_logrank" -> q268_oracle,
    "q267_cmh" -> q267_oracle,
    "q266_kaplan_meier" -> q266_oracle,
    "q264_msprt" -> q264_oracle,
    "q263_top_share" -> q263_oracle,
    "q261_capture_recapture" -> q261_oracle,
    "q259_wilson_ci" -> q259_oracle,
    "q260_vocab_richness" -> q260_oracle,
    "q258_table_profile" -> q258_oracle,
    "q256_cuped" -> q256_oracle,
    "q255_effect_size" -> q255_oracle,
    "q254_benford" -> q254_oracle,
    "q253_mann_whitney" -> q253_oracle,
    "q252_spearman" -> q252_oracle,
    "q251_bh_fdr" -> q251_oracle,
    "q250_trimmed_mean" -> q250_oracle,
    "q249_moment_census" -> q249_oracle,
    "q247_priority_sample" -> q247_oracle,
    "q248_priority_estimate" -> q248_oracle,
    "q246_auc_signal" -> q246_oracle,
    "q244_bootstrap_median" -> q244_oracle,
    "q242_bootstrap_ratio" -> q242_oracle,
    "q240_bootstrap_ci" -> q240_oracle,
    "q235_theta_joint" -> q235_oracle,
    "q230_hdr_quantiles" -> q230_oracle,
    "q231_exact_quantiles" -> q231_oracle,
    "q232_hdr_merged" -> q232_oracle,
    "q233_hdr_weighted" -> q233_oracle,
    "q200_dispersion" -> q200_oracle,
    "q201_langid_kappa" -> q201_oracle,
    "q202_lexical_diversity" -> q202_oracle,
    "q204_isotonic_calibration" -> q204_oracle,
    "q209_grouped_calibration" -> q209_oracle,
    "q211_ks_drift" -> q211_oracle,
    "q212_gini_mix" -> q212_oracle,
    "q213_ks_by_lang" -> q213_oracle,
    "q214_calibration_apply" -> q214_oracle,
    "q219_conformal_threshold" -> q219_oracle,
    "q220_fleiss_kappa" -> q220_oracle,
    "q221_rbo_signals" -> q221_oracle,
    "q222_sample_quotas" -> q222_oracle,
    "q224_theta_intersect" -> q224_oracle,
    "q225_exact_intersect" -> q225_oracle,
    "q226_krippendorff_interval" -> q226_oracle,
    "q227_krippendorff_ordinal" -> q227_oracle,
    "q228_theta_setops" -> q228_oracle,
    "q229_theta_merged" -> q229_oracle,
    "q223_krippendorff_alpha" -> q223_oracle,
    "q199_vocab_growth" -> q199_oracle,
    "q198_kn3_fluency" -> q198_oracle,
    "q196_pmi_collocations" -> q196_oracle,
    "q195_span_pairs" -> q195_oracle,
    "q194_dict_spans" -> q194_oracle,
    "q192_kn_fluency" -> q192_oracle,
    "q190_keyness_drift" -> q190_oracle,
    "q189_dict_tags" -> q189_oracle,
    "q185_weighted_sample" -> q185_oracle,
    "q186_match_composition" -> q186_oracle,
    "q188_budget_allocation" -> q188_oracle,
    "q173_bpe_train" -> q173_oracle,
    "q178_token_spectrum" -> q178_oracle,
    "q101_incremental_neardup" -> q101_oracle,
    "q98_dsir_rank" -> q98_oracle,
    "q97_gopher_repetition" -> q97_oracle,
    "q96_priority_survivors" -> q96_oracle,
    "q95_containment_pairs" -> q95_oracle,
    "q94_lm_perplexity" -> q94_oracle,
    "q90_repeated_spans" -> q90_oracle,
    "q91_span_scrub" -> q91_oracle,
    "q34_rolling_fingerprint" -> q34_oracle,
    "q86_weighted_mix" -> q86_oracle,
    "q84_chunk_tokens" -> q84_oracle,
    "q82_incremental_dedup" -> q82_oracle,
    "q112_incremental_dedup_large" -> q112_oracle,
    "q75_redact_pii" -> q75_oracle,
    "q77_bm25_topk" -> q77_oracle,
    "q78_split_assign" -> q78_oracle,
    "q73_pipeline" -> q73_oracle,
    "q72_decontaminate" -> q72_oracle,
    "q70_sequence_pack" -> q70_oracle,
    "q69_stratified_sample" -> q69_oracle,
    "q67_term_freq" -> q67_oracle,
    "q68_repetition" -> q68_oracle,
    "q66_neardup_components" -> q66_oracle,
    "q55_bpe_tokens" -> q55_oracle,
    "q26_token_stats" -> q26_oracle,
    "q27_lang_profile" -> q27_oracle,
    "q28_quality_score" -> q28_oracle,
    "q29_fingerprint_dedup" -> q29_oracle,
    "q30_jaccard_pairs" -> q30_oracle,
    "q31_minhash_lsh_pairs" -> q31_oracle,
    "q106_normalized_neardup" -> q106_oracle,
    "q145_ppjoin_pairs" -> q145_oracle,
    "q146_sparse_cosine" -> q146_oracle,
    "q147_phrase_search" -> q147_oracle,
    "q148_bpe_pair_stats" -> q148_oracle,
    "q149_bpe_apply" -> q149_oracle,
    "q151_threshold_sweep" -> q151_oracle,
    "q155_novelty_profile" -> q155_oracle,
    "q157_token_pairs" -> q157_oracle,
    "q158_source_overlap" -> q158_oracle,
    "q162_bpe_fertility" -> q162_oracle,
    "q164_length_quantiles" -> q164_oracle,
    "q167_cms_heavy" -> q167_oracle,
    "q168_cms_merged" -> q167_oracle,
    "q170_robust_outliers" -> q170_oracle,
    "q171_dedup_by_source" -> q171_oracle,
    "q172_quantile_normalize" -> q172_oracle,
    "q108_url_canon_dedup" -> q108_oracle,
    "q109_html_extract" -> q109_oracle,
    "q110_classifier_label" -> q110_oracle,
    "q111_clean_lines" -> q111_oracle,
    "q113_extract_links" -> q113_oracle,
    "q114_domain_cap" -> q114_oracle,
    "q117_paragraph_dedup" -> q117_oracle,
    "q126_incr_paragraph_dedup" -> q126_incr_paragraph_oracle,
    "q137_incr_paragraph_large" -> q126_incr_paragraph_oracle,
    "q130_dup_line_profile" -> q130_dup_line_oracle,
    "q133_curation_funnel" -> q133_curation_oracle,
    "q134_sequence_packing" -> q134_packing_oracle,
    "q180_aligned_packing" -> q180_aligned_oracle,
    "q183_temperature_mix" -> q183_temperature_oracle,
    "q184_perplexity_buckets" -> q184_buckets_oracle,
    "q135_token_budget" -> q135_budget_oracle,
    "q136_shuffled_packing" -> q136_shuffled_oracle,
    "q138_boilerplate_ngrams" -> q138_boilerplate_oracle,
    "q139_funnel_by_source" -> q139_funnel_src_oracle,
    "q142_char_stats" -> q142_char_oracle,
    "q143_grouped_split" -> q143_grouped_split_oracle,
    "q122_winnow_fingerprints" -> q122_oracle,
    "q32_dedup_survivors" -> q32_oracle,
    "q33_simhash_pairs" -> q33_oracle,
    "q104_simhash_capped" -> q104_oracle,
    "q35_langid" -> q35_oracle)
}
