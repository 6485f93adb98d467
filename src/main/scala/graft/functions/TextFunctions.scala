package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data-pipeline operators
  * (tokenization, n-gram shingles, fingerprints, MinHash, SimHash,
  * language-ID and quality heuristics). All are per-row codegen-friendly
  * builtin compositions — no UDFs — so they pipeline inside the scan and
  * cost nothing extra in shuffles at 100 TB.
  */
object TextFunctions {
  /** Whitespace tokenizer (fixture text is clean single-spaced lowercase;
    * for messier corpora swap the pattern for "\\s+"). */
  def tokens(text: Column): Column = split(text, " ")

  def nTokens(text: Column): Column = size(tokens(text)).cast("long")

  /** Word n-gram shingles (overlapping), e.g. n=3 → "a b c", "b c d", …
    * Guarded for texts shorter than n tokens (Spark's sequence(1, 0)
    * would otherwise count DOWN and fabricate bogus shingles).
    * CAUTION: the lambda re-splits the text per gram — O(tokens²) per
    * document. Fine for short fixture rows and oracle SQL parity; any
    * bulk path should use [[positionalShingles]] instead. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** ALL word n-gram shingles in token order (duplicates kept, positions
    * = token offsets under posexplode) — native single-pass expression.
    * Use this, not [[shingles]], whenever the array is consumed inside a
    * Generate/lambda: the HOF build re-splits the text per gram
    * (O(tokens²) per document — see WordShinglesAll's scaladoc). */
  def positionalShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.WordShinglesAll(
      GraftColumnBridge.expression(text), n))
  }

  /** Distinct word n-gram shingles — native single-pass expression (the
    * HOF composition array_distinct(shingles(...)) computes the same set
    * but interpreted and vulnerable to CollapseProject re-inlining). */
  def distinctShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.WordShingles(
      GraftColumnBridge.expression(text), n))
  }

  /** |A ∩ B| over two ASC-sorted duplicate-free array<string> columns —
    * size(array_intersect(a, b)) as one allocation-free merge walk
    * ([[graft.expressions.SortedIntersectCount]]). The rerank step of
    * every candidate-join operator evaluates this once PER CANDIDATE
    * PAIR; sort the arrays once per document (array_sort) and the pair
    * cost drops from hash-set-plus-result-array to two pointers. */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** [[sortedIntersectCount]] over ASC-sorted duplicate-free
    * array<bigint> columns — the hashed-token fast path (primitive
    * compares). Only exact when the hash is injective on the corpus;
    * callers must verify (count-distinct parity) and fall back. */
  def sortedLongIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.SortedLongIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Sparse integer dot over two array<struct<key,cnt>> posting lists
    * sorted ASC by key ([[graft.expressions.SortedEntriesDot]]) — the
    * per-pair replacement for the interpreted
    * aggregate(map_values(map_zip_with(...))) fold. */
  def sortedEntriesDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.SortedEntriesDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Content fingerprint for exact / normalized dedup (md5 of lowercased
    * text — stable across engines, unlike engine-native hash functions). */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** MinHash signature: k minimums over seeded xxhash64 of each shingle.
    * One array expression per row; k * |shingles| hash evaluations.
    * CAUTION: pass a *materialized* shingle column (bound attribute), not
    * a nested expression — CollapseProject would inline the shingle
    * construction into every lambda iteration. For bulk pipelines prefer
    * the explode+agg formulation in Dedup.minhashLshPairs, which stays in
    * whole-stage codegen. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** LSH band hashes: split the k-long signature into `bands` bands of
    * k/bands rows each and hash every band — equal band hash ⇒ candidate
    * pair. Returns an array of `bands` longs. Same materialized-input
    * caution as minhashSignature. */
  def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * r + 1, lit(r)).cast("string")))
  }

  /** 64-bit SimHash over the token multiset of a text column: bit i of
    * the result is the sign of Σ_tokens (bit i of hash(token) ? +1 : -1)
    * where hash is md5-derived (= DuckDB md5_number_lower — portable
    * across engines, which is what lets q33 run under a real oracle).
    * Near-identical texts differ in few bits — compare with hamming().
    * Native single-pass expression. */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.SimHash64(
      GraftColumnBridge.expression(text)))
  }

  /** simhash64 by column name (compat shim for earlier SQL-based form). */
  def simhash64On(colName: String): Column = simhash64(col(colName))

  /** Hamming distance between two packed 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Tiny per-language stopword lexicons for the n-gram/stopword
    * language-ID heuristic. */
  val langLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai"))

  /** Count of tokens present in a lexicon. */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(lexicon: _*))).cast("long")

  /** Stopword ratio against the English lexicon (quality heuristic). */
  def stopwordRatio(text: Column): Column =
    lexiconHits(text, langLexicons("en")).cast("double") / nTokens(text)

  /** PII scrubbing for training corpora: masks emails, phone-shaped
    * number groups, then any remaining long digit run, in that fixed
    * order (emails/phones contain digit runs, so the specific mask must
    * win over the generic one). Patterns are deliberately restricted to
    * the regex intersection of Java (Spark codegen) and RE2 (DuckDB,
    * Go tooling) — character classes, bounded repeats, \b — so the SAME
    * operator definition runs under any engine a pipeline audits with.
    * Per-row codegen'd regexp_replace chain: pipelines inside the scan,
    * nothing rides a shuffle. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val phone = regexp_replace(email,
      "\\b[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?\\b", "[PHONE]")
    regexp_replace(phone, "[0-9]{6,}", "[NUM]")
  }

  /** Overlapping token-window chunks — the split-for-embedding /
    * context-packing shape (window tokens per chunk, stride tokens
    * between chunk starts; the last chunk may be shorter). Chunk i
    * covers tokens [i·stride, i·stride+window); chunk count for an
    * n-token doc is floor((n-1)/stride)+1, so every token is covered
    * and no chunk starts past the end. Native single-pass per-row
    * expression (the HOF build re-split the text per chunk); the
    * end-clamp matches DuckDB's list slicing, which is what makes the
    * q84 gate oracle-exact. */
  def chunkTokens(text: Column, window: Int, stride: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ChunkTokens(
      GraftColumnBridge.expression(text), window, stride))
  }

  /** Rolling fingerprint of the token sequence (order-sensitive, unlike
    * md5 of the raw string — detects reorderings): sequential fold of
    * h = rot5_52(h) XOR md5_52(token), all in a 52-bit space.
    * Engine-portable by construction — the per-token hash is the first
    * 13 md5 hex chars (md5 is md5 everywhere) and the 5-bit rotate is
    * expressed as ·32 mod 2^52 plus div 2^47, which never overflows a
    * signed 64-bit long (ANSI mode raises on wrap-around, and signed vs
    * unsigned shift semantics diverge across engines; staying in 52
    * nonnegative bits sidesteps both). This is what lets q34 run under
    * a real DuckDB oracle (list_reduce with the same fold). */
  /** Winnowing fingerprints (MOSS — Schleimer et al., SIGMOD 2003):
    * the rightmost-minimum gram hash of every w-window, guaranteeing a
    * shared fingerprint for any shared run of w+k−1 tokens while
    * keeping only ~2/(w+1) of grams — the sub-sampled alternative to
    * the full [[rollingHash]] sequence for fingerprint joins. Returns
    * array<struct<pos, fp>>; see
    * [[graft.expressions.WinnowFingerprints]] for the exact contract. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.WinnowFingerprints(
      GraftColumnBridge.expression(text), k, w))
  }

  def rollingHash(text: Column): Column = {
    val mask = 1L << 52
    aggregate(tokens(text), lit(0L), (acc, t) =>
      ((acc * 32) % mask +
        call_function("shiftrightunsigned", acc, lit(47))).bitwiseXOR(
        graft.functions.SketchFunctions.md5Prefix(t, 13)))
  }

  /** Positional q-gram multiset as array<struct<g, occ>> — one native
    * pass per string ([[graft.expressions.QGramOccs]]); occ numbers
    * repeated grams in position order, exactly the
    * posexplode + row_number window it replaces in EditJoin. */
  def qgramOccs(text: Column, q: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.QGramOccs(
      GraftColumnBridge.expression(text), q))
  }

  /** Unicode fold for cross-lingual dedup keys: NFD + strip combining
    * marks + root-locale lowercase (native [[graft.expressions.FoldText]];
    * DuckDB analogue `lower(strip_accents(x))`). Feed the result to any
    * text dedup operator — e.g. minhashLshPairs over foldText(text)
    * merges case/diacritic variants the raw-token operators treat as
    * distinct documents. */
  def foldText(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.FoldText(
      GraftColumnBridge.expression(text)))
  }

  /** Dictionary tagging: distinct tag ids (ascending) of every
    * dictionary phrase occurring as a SUBSTRING of the text — one
    * Aho–Corasick pass per row, O(bytes) independent of dictionary
    * size ([[graft.expressions.DictTags]]). The taxonomy/keyword
    * labeling pass; semantics match `contains(text, phrase)`. */
  def dictTags(text: Column, dict: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.DictTags(
      GraftColumnBridge.expression(text), dict))
  }

  /** [[dictTags]]'s span form: EVERY occurrence as struct(tag, pos)
    * with pos the 1-based start offset — overlapping/repeated matches
    * included, (pos, tag)-ordered ([[graft.expressions.DictTagSpans]]).
    * The annotation/redaction primitive. */
  def dictTagSpans(text: Column, dict: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.DictTagSpans(
      GraftColumnBridge.expression(text), dict))
  }

  /** URL canonicalization for web-corpus dedup keys: scheme/host
    * lowercase, default-port and fragment drop, unreserved
    * percent-decode with uppercase residual hex, dot-segment and
    * duplicate-slash path cleanup, tracking-param strip + byte-wise
    * param re-sort (full rules: [[graft.expressions.UrlCanonicalize]]).
    * Feed the result to exactGroups / exactSurvivors — byte-distinct
    * aliases of the same page share one canonical key. */
  def canonicalizeUrl(url: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.CanonicalizeUrl(
      GraftColumnBridge.expression(url)))
  }

  /** HTML → text extraction (crawl ingestion step 0): drops comments
    * and script/style elements with their content, strips remaining
    * tags, decodes core + numeric character entities, collapses
    * whitespace (full spec: [[graft.expressions.HtmlToText]]). Feed
    * the result to the tokenizer/quality/dedup operators — they all
    * assume markup-free text. */
  def stripHtml(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.StripHtml(
      GraftColumnBridge.expression(html)))
  }

  /** Outlink extraction: every `<a href=…>` target in document order
    * (double/single/unquoted forms; raw attribute values — compose
    * with [[canonicalizeUrl]] for dedup-grade keys; see
    * [[graft.expressions.ExtractLinksImpl]]). The link-graph
    * construction step: posexplode + canonicalize + host aggregation
    * gives in/out-degree and link-spam signals. */
  def extractLinks(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ExtractLinks(
      GraftColumnBridge.expression(html)))
  }

  /** Anchor extraction: every `<a href=…>…</a>` as struct(href, text)
    * in document order — href raw (canonicalize downstream), text the
    * [[stripHtml]]-grade extraction of the inner HTML. Anchor text is
    * the off-page signal link-graph pipelines aggregate per TARGET
    * (it describes the page being linked, written by the linker); see
    * [[graft.expressions.ExtractAnchorsImpl]] for grammar limits. */
  def extractAnchors(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.ExtractAnchors(
      GraftColumnBridge.expression(html)))
  }

  /** Line-level boilerplate filtering — the C4 cleaning rule family
    * (Raffel et al. 2020, arXiv:1910.10683 §2.2): pages keep their
    * prose but shed navigation/consent/"enable javascript" lines. A
    * line survives when it has at least `minWords` whitespace words
    * AND contains no blocklist phrase (case-insensitive substring);
    * survivors re-join with the original newline. Pure builtin
    * composition (split/filter/array_join) — per-row, codegen'd,
    * nothing rides a shuffle; every rule is deterministic so an
    * oracle recomputes it with list_filter. */
  def cleanLines(text: Column, minWords: Int,
      blocklist: Seq[String]): Column = {
    require(blocklist.forall(b => b == b.toLowerCase(java.util.Locale.ROOT)),
      "blocklist phrases must be lowercase (lines are lowercased before " +
        "the substring test)")
    array_join(
      filter(split(text, "\n"), line => {
        val enough = size(split(line, " ")) >= lit(minWords)
        val blocked = blocklist
          .map(b => lower(line).contains(lit(b)))
          .reduceOption(_ || _).getOrElse(lit(false))
        enough && !blocked
      }),
      "\n")
  }
}
