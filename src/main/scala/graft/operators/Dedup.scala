package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard. The reference
  * only *specifies* dedup — its `(source,id)` uniqueness check is declared
  * but never enforced (reference src/db.rs:15-16, api.rs:524-537); here it
  * is a first-class operator family.
  *
  * Scale design: every op is a sequence of {per-row expression, explode,
  * equi-join on a small key, hash agg} — the shapes Spark shuffles
  * efficiently. Nothing ever compares all pairs: candidate generation goes
  * through an inverted index (shared shingle / band hash / simhash band),
  * so cost is Σ bucket², not n². For 100 TB add a frequency cap on
  * pathological buckets (stop-shingle removal) — noted inline.
  */
object Dedup {

  /** Exact dedup summary: one row per distinct key with the surviving id
    * (min) and the duplicate count. Plain hash-groupBy — map-side partial
    * agg makes the shuffle carry one row per distinct key per task. */
  def exactGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(min(id).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exact dedup survivors: the input rows minus later duplicates (keeps
    * the min-id row per key). Window row_number per key — one shuffle. */
  def exactSurvivors(df: DataFrame, key: Column, id: Column): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(key).orderBy(id)))
      .filter(col("__rn") === 1).drop("__rn")

  /** Incremental exact dedup: survivors of a NEW batch against an
    * already-ingested corpus — the shape every continuously-fed
    * training pipeline runs per delivery (dedup the delta, never
    * re-dedup the lake). Keeps one batch row per fingerprint (min id)
    * and drops fingerprints the corpus already has.
    *
    * Scale shape: the batch is small, the corpus is not — so the
    * BATCH's distinct fingerprints broadcast into a semi-join over one
    * streaming corpus scan (the corpus is never shuffled, never
    * collected), and only the matched fingerprints — bounded by the
    * batch size — come back to anti-join the batch. Corpus fingerprints
    * computed in the scan, nothing else read. */
  def incrementalSurvivors(batch: DataFrame, corpus: DataFrame,
      key: DataFrame => Column, id: Column): DataFrame = {
    val keyed = batch.withColumn("__fp", key(batch))
    val batchFps = keyed.select(col("__fp")).distinct()
    val alreadyIn = corpus.select(key(corpus).as("__fp"))
      .join(broadcast(batchFps), Seq("__fp"), "left_semi")
      .distinct()
    exactSurvivors(keyed, col("__fp"), id)
      .join(broadcast(alreadyIn), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Incremental exact dedup for LARGE deltas — same semantics as
    * [[incrementalSurvivors]] when the batch is too big to broadcast
    * its exact fingerprint set (a 1B-key backfill is tens of GB of
    * strings; no executor broadcasts that). Replace the exact
    * broadcast with a BLOOM broadcast:
    *
    *  1. distributed bloom build over the batch's fingerprints
    *     (`stat.bloomFilter` merges per-partition filters; the driver
    *     holds only the fixed `expectedKeys`/`fpp`-sized bitmap —
    *     ~1.2 GB at 1B keys / 1% fpp vs tens of GB exact);
    *  2. the corpus scan probes the bloom per row inside codegen
    *     ([[graft.expressions.BloomMightContain]]) — ~(1−fpp) of the
    *     non-duplicate corpus never leaves its scan stage;
    *  3. the surviving sliver (true dups + fpp of the corpus) is
    *     confirmed EXACTLY with a shuffled semi-join against the
    *     batch's distinct fingerprints — false positives die here, so
    *     the operator's output is bit-identical to the exact path at
    *     any fpp (the q112 gate pins this with q82's own oracle);
    *  4. batch survivors anti-join the confirmed set — shuffled, not
    *     broadcast: the confirmed set is bounded by the batch's
    *     distinct keys, which in this regime is large by assumption.
    *
    * The bloom build reads the batch once eagerly (a stat job), the
    * corpus streams exactly once, and nothing driver-side scales with
    * the CORPUS — only with the chosen filter size. */
  def incrementalSurvivorsLarge(batch: DataFrame, corpus: DataFrame,
      key: DataFrame => Column, id: Column,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val keyed = batch.withColumn("__fp", key(batch))
    val bf = keyed.stat.bloomFilter("__fp", expectedKeys, fpp)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    val batchFps = keyed.select(col("__fp")).distinct()
    val alreadyIn = corpus.select(key(corpus).as("__fp"))
      .filter(graft.functions.SketchFunctions.bloomMightContain(
        col("__fp"), baos.toByteArray))
      .join(batchFps, Seq("__fp"), "left_semi")
      .distinct()
    exactSurvivors(keyed, col("__fp"), id)
      .join(alreadyIn, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** All-pairs n-gram Jaccard ≥ minJaccard via inverted-index join:
    * explode distinct shingles → self-join on shingle → count common →
    * jac = common / (na + nb − common). Never materializes non-candidate
    * pairs. At 100 TB: drop shingles with document frequency above a cap
    * first (they generate the big buckets and carry no signal). */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJaccard: Double = 0.1): DataFrame = {
    // repartition = materialization barrier: the two join sides below
    // then share one shuffle (ReusedExchange) and size()/explode() read
    // the stored array instead of re-running the shingle build.
    val sh = docs.select(
      col(idCol).as("id"),
      distinctShingles(col(textCol), n).as("shingles"))
      .repartition(col("id"))
    val ex = sh.select(col("id"), size(col("shingles")).as("nsh"),
      explode(col("shingles")).as("s"))
    val a = ex.select(col("id").as("id_a"), col("nsh").as("na"), col("s"))
    val b = ex.select(col("id").as("id_b"), col("nsh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("common").cast("long").as("common"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
        col("jac"))
  }

  /** Candidate+rerank variant of ngramJaccardPairs for skewed corpora:
    * shingles with document frequency above `maxDf` are dropped from
    * CANDIDATE GENERATION only (they generate the Σf² join blowup and
    * carry no discrimination), then every surviving candidate pair is
    * reranked with its FULL shingle sets, so jaccard values are exact.
    * A pair is missed only if every one of its shared shingles is a
    * stop-shingle — pick maxDf comfortably above the corpus's template
    * phrases' df and results equal the exact operator (tested). */
  def ngramJaccardPairsCapped(docs: DataFrame, textCol: String,
      idCol: String, n: Int = 3, minJaccard: Double = 0.1,
      maxDf: Int = 1000): DataFrame = {
    // arrays sorted once per doc so the per-pair rerank runs the
    // allocation-free merge-walk kernel (r18, the PrefixJoin note)
    val sh = docs.select(
      col(idCol).as("id"),
      array_sort(distinctShingles(col(textCol), n)).as("shingles"))
      .repartition(col("id"))
    val ex = sh.select(col("id"), explode(col("shingles")).as("s"))
    val rare = ex.groupBy(col("s"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
      .select(col("s"))
    val exRare = ex.join(rare, Seq("s"))
    val cand = exRare.select(col("id").as("id_a"), col("s"))
      .join(exRare.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("common",
        sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("na", size(col("sh_a")).cast("long"))
      .withColumn("nb", size(col("sh_b")).cast("long"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= minJaccard)
      .select("id_a", "id_b", "common", "na", "nb", "jac")
  }

  /** Directed shingle-containment pairs: C(a→b) = |A∩B| / |A| ≥
    * `minContainment`, where A is doc a's distinct n-gram shingle set.
    * The asymmetric companion to [[ngramJaccardPairs]]: a short document
    * quoted whole inside a much longer one has containment ≈ 1 while its
    * symmetric Jaccard is only ≈ |A|/|B| — the pair every
    * quote/excerpt/boilerplate dedup pass needs and Jaccard misses.
    * Emits ordered pairs (id_a is the contained side), both directions
    * when both clear the threshold.
    *
    * Same inverted-index shape as Jaccard (explode distinct shingles →
    * equi self-join on the shingle → count common): cost is Σ df² over
    * shingle document frequencies, never n². Shingles with df above
    * `maxDf` are dropped from the index AND from both the numerator and
    * the denominator — at 100 TB boilerplate shingles otherwise blow up
    * the join and saturate every short template doc's containment, so
    * the capped score is containment over the informative shingles
    * (identical to the uncapped score when maxDf exceeds every df). */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minContainment: Double = 0.6,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      distinctShingles(col(textCol), n).as("shingles"))
      .repartition(col("id"))
    val ex = sh.select(col("id"), explode(col("shingles")).as("s"))
    val exR =
      if (maxDf == Int.MaxValue) ex
      else ex.join(
        ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("s")),
        Seq("s"))
    // per-doc informative-shingle count: one row per doc, broadcast back
    val na = exR.groupBy(col("id")).agg(count(lit(1)).as("na"))
    val a = exR.join(na, Seq("id"))
      .select(col("id").as("id_a"), col("na"), col("s"))
    val b = exR.select(col("id").as("id_b"), col("s"))
    a.join(b, Seq("s")).filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"), first(col("na")).as("na"))
      .withColumn("containment",
        col("common").cast("double") / col("na"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"),
        col("common").cast("long").as("common"),
        col("na").cast("long").as("na"), col("containment"))
  }

  /** Survivor selection over near-dup clusters with a source-priority
    * policy: within each connected component of the near-dup graph keep
    * exactly one row — the one whose `priority` expression is SMALLEST
    * (ties broken by min id). "Prefer curated over web over crawl" is
    * the survivor rule real corpus builds use; min-id (what
    * [[exactSurvivors]] does per fingerprint) is only right when all
    * copies are equally trustworthy.
    *
    * Scale shape: the cluster labels come from [[connectedComponents]]
    * over an LSH candidate graph (edges, not all pairs), the join back
    * to `docs` is id-equi, and the per-component pick is one
    * row_number window — partitioned by component, so skew is bounded
    * by the largest near-dup cluster, which the LSH bucket cap already
    * bounds upstream.
    *
    * Null contract: a NULL `priority` sorts LAST (least trusted), not
    * first — a priority expression that fails to parse a source id
    * (e.g. `cast` returning null on a non-conforming id) must never
    * silently WIN the survivor pick over rows whose priority is known
    * (ADVICE r08). Callers wanting a different rank for unparseable
    * sources should coalesce to an explicit sentinel. */
  def prioritySurvivors(docs: DataFrame, idCol: String, pairs: DataFrame,
      priority: Column): DataFrame = {
    val comp = connectedComponents(docs.select(col(idCol)), idCol, pairs)
      .select(col("id").as("__cc_id"), col("component").as("__cc"))
    docs.join(comp, docs(idCol) === comp("__cc_id"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__cc"))
          .orderBy(priority.asc_nulls_last, col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cc_id", "__cc")
  }

  /** MinHash + LSH near-dup pairs: k-hash signature → `bands` band
    * hashes → candidates share ≥1 band bucket → exact-Jaccard rerank by
    * joining shingle sets back by id (so the wide shingle arrays never
    * ride through the band explode/shuffle — only (id, bandHash) does).
    *
    * With k=64, bands=32 (r=2) the candidate probability at jac=0.5 is
    * 1−(1−0.25)^32 ≈ 0.9999, so for thresholds ≥0.5 the output equals the
    * exact all-pairs result with near-certainty while scanning only
    * bucket-mates. */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 32,
      minJaccard: Double = 0.5, maxBucket: Option[Int] = None): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    import org.apache.spark.sql.GraftColumnBridge
    // sorted per doc for the merge-walk rerank (r18, PrefixJoin note);
    // band hashing is a min over elements — order-independent
    val sh = docs.select(
      col(idCol).as("id"),
      array_sort(distinctShingles(col(textCol), n)).as("shingles"))
      .repartition(col("id")) // materialize once; rerank reuses it below
    // Per-row native MinHash→band hashes (one string hash per shingle +
    // k universal-hash mixes, bands folded inside the same expression —
    // see LshBandHashes for why this shape dodges both the interpreted-
    // lambda tax and CollapseProject recompute).
    val bandArr = GraftColumnBridge.column(graft.expressions.LshBandHashes(
      GraftColumnBridge.expression(col("shingles")), k, bands))
    val buckets = sh.select(col("id"),
      posexplode(bandArr).as(Seq("band", "bhash")))
    // Degenerate-bucket cap (the band-join analogue of the shingle df
    // cap): a band bucket of f members contributes f² candidate pairs,
    // so one template-text bucket can dominate the whole join. Buckets
    // above the cap are dropped from CANDIDATE GENERATION only — a true
    // pair is lost only if EVERY band it agrees on is degenerate, so a
    // cap above the legitimate duplicate-cluster size keeps the output
    // equal to the exact operator (tested in DedupSpec).
    val capped = maxBucket match {
      case Some(cap) =>
        val ok = buckets.groupBy(col("band"), col("bhash"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= cap)
          .select(col("band"), col("bhash"))
        buckets.join(ok, Seq("band", "bhash"))
      case None => buckets
    }
    val cand = capped.as("x")
      .join(capped.as("y"), Seq("band", "bhash"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val withSets = cand
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
    withSets
      .withColumn("common",
        sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("na", size(col("sh_a")).cast("long"))
      .withColumn("nb", size(col("sh_b")).cast("long"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= minJaccard)
      .select("id_a", "id_b", "common", "na", "nb", "jac")
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming. Pigeonhole
    * blocking: split the 64-bit hash into `maxHamming+1` bands — any pair
    * within the radius must agree on ≥1 whole band, so the join key is
    * (band index, band bits), never the full hash.
    *
    * Degenerate-fingerprint safety (the 100 TB posture, same two-part
    * contract as [[hammingHalvesPairs]] — see that doc for the full
    * argument):
    *   1. identical signatures NEVER enter the banded join — they
    *      pre-collapse to one distinct-fingerprint row, and their
    *      member pairs (hamming 0, e.g. boilerplate template docs) are
    *      emitted by an output-bounded equi-join on the full hash;
    *   2. `maxBucket` caps a band bucket by its DISTINCT-signature
    *      population; over-cap buckets are dropped from candidate
    *      generation only. Capped semantics are deterministic and
    *      oracle-checkable (gate q104 recomputes them in SQL). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Option[Int] = None): DataFrame = {
    val nb = maxHamming + 1
    val width = 64 / nb
    // native per-row simhash; repartition = materialization barrier so
    // every downstream scan (identical-pair join, distinct collapse,
    // member expansion) reuses one computed-signature exchange instead
    // of re-running the signature expression per scan
    val h = docs.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sim"))
      .repartition(col("id"))
    // (1) identical-signature pairs: full-hash equi-join — cost and
    // output are both the true pair count, never a banding blowup
    val eq = h.as("x").join(h.as("y"), Seq("sim"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("sim").as("sim_a"), col("sim").as("sim_b"),
        lit(0L).as("hamming"))
    // (2) only DISTINCT signatures are banded
    val fps = h.select(col("sim")).distinct()
    val bandArr = transform(
      sequence(lit(0), lit(nb - 1)),
      b => call_function("shiftright", col("sim"), b * width)
        .bitwiseAND(lit((1L << width) - 1)))
    val banded = fps.select(col("sim"),
      posexplode(bandArr).as(Seq("band", "bits")))
    val capped = maxBucket match {
      case Some(cap) =>
        val ok = banded.groupBy(col("band"), col("bits"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= cap)
          .select(col("band"), col("bits"))
        banded.join(ok, Seq("band", "bits"))
      case None => banded
    }
    // candidate DISTINCT-signature pairs, canonically ordered by value
    val cand = capped.as("x").join(capped.as("y"), Seq("band", "bits"))
      .filter(col("x.sim") < col("y.sim"))
      .select(col("x.sim").as("__sa"), col("y.sim").as("__sb"))
      .distinct()
      .withColumn("hamming",
        hamming(col("__sa"), col("__sb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
    // expand signature pairs to member pairs, re-orienting to id_a<id_b
    val cross = cand
      .join(h.select(col("id").as("__ia"), col("sim").as("__sa")), "__sa")
      .join(h.select(col("id").as("__ib"), col("sim").as("__sb")), "__sb")
      .select(
        least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        when(col("__ia") < col("__ib"), col("__sa")).otherwise(col("__sb"))
          .as("sim_a"),
        when(col("__ia") < col("__ib"), col("__sb")).otherwise(col("__sa"))
          .as("sim_b"),
        col("hamming"))
    eq.unionByName(cross)
  }

  /** Incremental NEAR-dup detection: MinHash-LSH pairs between a NEW
    * batch and an already-ingested corpus — [[incrementalSurvivors]]'
    * delta-dedup shape extended from exact fingerprints to jaccard
    * near-duplicates. Output (batch_id, corpus_id, common, na, nb,
    * jac) for every cross pair with exact jaccard ≥ `minJaccard`;
    * within-batch pairs are [[minhashLshPairs]]' job, within-corpus
    * pairs were dealt with at their own ingest time.
    *
    * Scale shape (the whole point): the CORPUS IS NEVER SHUFFLED. Its
    * single scan computes shingles + band hashes per row, a broadcast
    * semi-ish join against the batch's distinct (band, bhash) buckets
    * filters it to candidate rows (bounded by batch size × bucket
    * collisions), and the exact rerank joins the BATCH's shingle sets
    * in by broadcast. Only the candidate pair set — not the corpus —
    * rides any exchange. The identity argument of q31 applies
    * unchanged: at k=64/bands=32 a true pair at jac ≥ 0.5 shares a
    * band bucket with near-certainty (and provably at the planted
    * near-dup band), so the output equals the exact cross-slice
    * all-pairs result on such corpora. */
  def incrementalNearDups(batch: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, n: Int = 3, k: Int = 64,
      bands: Int = 32, minJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    import org.apache.spark.sql.GraftColumnBridge
    def bandArr(c: Column) = GraftColumnBridge.column(
      graft.expressions.LshBandHashes(
        GraftColumnBridge.expression(c), k, bands))
    // sorted per doc for the merge-walk rerank (r18); band hashing is
    // a min over elements — order-independent
    val bsh = batch.select(col(idCol).as("id_b"),
        array_sort(distinctShingles(col(textCol), n)).as("sh_b"))
      .withColumn("bands", bandArr(col("sh_b")))
      .localCheckpoint(false) // small by contract; planned once, broadcast twice
    val bBuckets = bsh.select(col("id_b"),
      posexplode(col("bands")).as(Seq("band", "bhash")))
    // one corpus scan: band hashes computed in the scan projection,
    // broadcast hash join against the batch buckets (no corpus
    // exchange); candidates reduce to an ids-only pair set BEFORE any
    // shuffle, so nothing wide rides an exchange with band-count
    // amplification
    val cand = corpus.select(col(idCol).as("id_c"),
        posexplode(bandArr(distinctShingles(col(textCol), n)))
          .as(Seq("band", "bhash")))
      .join(broadcast(bBuckets), Seq("band", "bhash"))
      .filter(col("id_b") =!= col("id_c"))
      .select(col("id_b"), col("id_c")).distinct()
      .localCheckpoint(false) // batch-bounded; reused for the pruned rescan
    // second corpus pass, broadcast-pruned to candidate ids only, joins
    // the shingle sets back for the exact rerank — scans are cheap and
    // column-pruned, shuffles are what the corpus must never pay
    val candIds = cand.select(col("id_c")).distinct()
    val csh = corpus.select(col(idCol).as("id_c"),
        array_sort(distinctShingles(col(textCol), n)).as("sh_c"))
      .join(broadcast(candIds), Seq("id_c"))
    cand
      .join(broadcast(bsh.select(col("id_b"), col("sh_b"))), Seq("id_b"))
      .join(csh, Seq("id_c"))
      .withColumn("common",
        sortedIntersectCount(col("sh_b"), col("sh_c")))
      .withColumn("na", size(col("sh_b")).cast("long"))
      .withColumn("nb", size(col("sh_c")).cast("long"))
      .withColumn("jac",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jac") >= minJaccard)
      .select(col("id_b"), col("id_c"), col("common"), col("na"),
        col("nb"), col("jac"))
  }

  /** Near-dup pairs over a PRECOMPUTED 64-bit fingerprint stored as two
    * 32-bit halves (the engine-portable packing of
    * [[graft.multimodal.Multimodal.imageAHash]] — no sign-bit
    * arithmetic anywhere): hamming(fp_a, fp_b) ≤ maxHamming via the
    * same pigeonhole banding as [[simhashPairs]], but consuming any
    * fingerprint column pair instead of re-hashing text. This is the
    * image/audio near-dup join: perceptual hashes come out of the
    * codec scan, THIS pairs them.
    *
    * Candidate generation is EXACT, not probabilistic: the 64 bits are
    * split into maxHamming+1 disjoint bands, so a pair within the
    * radius must agree on ≥1 whole band (pigeonhole) — the band join
    * can only over-generate, and the hamming rerank trims it. Cost is
    * Σ band-bucket², never n²; only (band, bits, halves) rides the
    * shuffle.
    *
    * Degenerate-fingerprint safety — the case that is COMMON on real
    * media corpora (blank/solid frames all hash to 0; a plain gradient
    * corpus measured 9,448 hamming-0 collisions):
    *   1. identical fingerprints NEVER enter the banded join. They
    *      pre-collapse to one distinct-fingerprint row, and their
    *      member pairs are emitted (hamming 0) by an equi-join on the
    *      FULL fingerprint — a hash join whose cost equals its output,
    *      the true duplicate pair count. A mega-group of f identical
    *      hashes costs one distinct row in banding instead of f banded
    *      rows and f² candidates needing rerank.
    *   2. `maxBucket` caps a band bucket by its DISTINCT-fingerprint
    *      population (identical hashes count once, so a true duplicate
    *      group can never trip the cap). Over-cap buckets are dropped
    *      from CANDIDATE GENERATION only; a true near-pair is lost only
    *      if every band it agrees on is degenerate across >cap OTHER
    *      distinct fingerprints. Capped semantics are deterministic and
    *      oracle-checkable (gate q105 recomputes them in SQL).
    *
    * Halves are masked to unsigned 32-bit after the long cast: a signed
    * INT half with bit 31 set would otherwise sign-extend, and the XOR
    * of sign-extended longs adds 32 phantom bits to the rerank distance
    * whenever the sign bits differ — silently dropping true pairs that
    * banding still finds. In-repo producers emit non-negative halves;
    * the mask makes the contract hold for any 32-bit column.
    *
    * The fingerprint frame is MATERIALIZED (localCheckpoint) before the
    * self-join: fingerprints are typically the output of a codec scan
    * (decode + hash of every image), and the typed mapPartitions nodes
    * in such a pipeline defeat exchange-reuse canonicalization — a
    * plain repartition barrier left the whole decode pipeline running
    * ONCE PER JOIN SIDE (measured in the q100 plan). Three longs per
    * row is the cheapest frame in the query; decoding the corpus twice
    * is not. On a real cluster the analogous move is persisting the
    * fingerprint table before the join. */
  def hammingHalvesPairs(hashes: DataFrame, idCol: String,
      loCol: String, hiCol: String, maxHamming: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    val nb = maxHamming + 1
    val width = 64 / nb
    require(64 % nb == 0 && width <= 32 && 32 % width == 0,
      s"maxHamming+1 ($nb) must split two 32-bit halves into whole " +
        "bands: use maxHamming in {1,3,7,15,31}")
    val perHalf = 32 / width
    val mask32 = lit(0xffffffffL)
    val h = hashes.select(col(idCol).as("id"),
      col(loCol).cast("long").bitwiseAND(mask32).as("lo"),
      col(hiCol).cast("long").bitwiseAND(mask32).as("hi"))
      .localCheckpoint(false)
    // (1) identical-fingerprint pairs: full-hash equi-join, output-bounded
    val eq = h.as("x").join(h.as("y"), Seq("lo", "hi"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0L).as("hamming"))
    // (2) only DISTINCT fingerprints are banded
    val fps = h.select(col("lo"), col("hi")).distinct()
    val bandArr = array((0 until nb).map { j =>
      val src = if (j < perHalf) col("lo") else col("hi")
      shiftright(src, (j % perHalf) * width)
        .bitwiseAND(lit((1L << width) - 1))
    }: _*)
    val banded = fps.select(col("lo"), col("hi"),
      posexplode(bandArr).as(Seq("band", "bits")))
    val capped = maxBucket match {
      case Some(cap) =>
        val ok = banded.groupBy(col("band"), col("bits"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= cap)
          .select(col("band"), col("bits"))
        banded.join(ok, Seq("band", "bits"))
      case None => banded
    }
    // candidate DISTINCT-fingerprint pairs, canonically (lo,hi)-ordered
    val cand = capped.as("x").join(capped.as("y"), Seq("band", "bits"))
      .filter(struct(col("x.lo"), col("x.hi")) <
        struct(col("y.lo"), col("y.hi")))
      .select(col("x.lo").as("lo_a"), col("x.hi").as("hi_a"),
        col("y.lo").as("lo_b"), col("y.hi").as("hi_b"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    // expand fingerprint pairs to member pairs (id_a < id_b)
    val cross = cand
      .join(h.select(col("id").as("__ia"),
        col("lo").as("lo_a"), col("hi").as("hi_a")), Seq("lo_a", "hi_a"))
      .join(h.select(col("id").as("__ib"),
        col("lo").as("lo_b"), col("hi").as("hi_b")), Seq("lo_b", "hi_b"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("hamming"))
    eq.unionByName(cross)
  }

  /** Incremental perceptual-hash near-dup: fingerprint pairs between a
    * NEW batch and an already-ingested corpus within `maxHamming` —
    * [[incrementalNearDups]]' delta-vs-lake shape for the
    * image/audio/video fingerprint family ([[hammingHalvesPairs]]'
    * within-corpus job is NOT re-run per delivery). Output
    * (id_b = batch id, id_c = corpus id, hamming).
    *
    * Scale shape: the CORPUS IS NEVER SHUFFLED — one scan computes its
    * pigeonhole band values in the projection and broadcast-joins
    * against the batch's banded fingerprints; because the fingerprint
    * IS the rerank input, the exact hamming filter runs inline in the
    * same stage (no second corpus pass, unlike the jaccard variant
    * whose shingle sets must join back). Only surviving pairs — batch
    * × radius bounded — ride the one exchange (the distinct). A
    * degenerate corpus fingerprint group contributes |group| candidate
    * rows per matching batch fingerprint (output-bounded), never the
    * f² a self-join bucket would. Candidate generation is EXACT by
    * pigeonhole, same argument as [[hammingHalvesPairs]]; halves are
    * masked unsigned-32 under the same contract. */
  def incrementalHammingPairs(batch: DataFrame, corpus: DataFrame,
      idCol: String, loCol: String, hiCol: String,
      maxHamming: Int = 3): DataFrame = {
    val nb = maxHamming + 1
    val width = 64 / nb
    require(64 % nb == 0 && width <= 32 && 32 % width == 0,
      s"maxHamming+1 ($nb) must split two 32-bit halves into whole " +
        "bands: use maxHamming in {1,3,7,15,31}")
    val perHalf = 32 / width
    val mask32 = lit(0xffffffffL)
    def bandArr(lo: Column, hi: Column) = array((0 until nb).map { j =>
      val src = if (j < perHalf) lo else hi
      shiftright(src, (j % perHalf) * width)
        .bitwiseAND(lit((1L << width) - 1))
    }: _*)
    val b = batch.select(col(idCol).as("id_b"),
        col(loCol).cast("long").bitwiseAND(mask32).as("lo_b"),
        col(hiCol).cast("long").bitwiseAND(mask32).as("hi_b"))
      .localCheckpoint(false) // small by contract (one delivery)
    val bBuckets = b.select(col("id_b"), col("lo_b"), col("hi_b"),
      posexplode(bandArr(col("lo_b"), col("hi_b")))
        .as(Seq("band", "bits")))
    corpus.select(col(idCol).as("id_c"),
        col(loCol).cast("long").bitwiseAND(mask32).as("lo_c"),
        col(hiCol).cast("long").bitwiseAND(mask32).as("hi_c"))
      .select(col("id_c"), col("lo_c"), col("hi_c"),
        posexplode(bandArr(col("lo_c"), col("hi_c")))
          .as(Seq("band", "bits")))
      .join(broadcast(bBuckets), Seq("band", "bits"))
      .filter(col("id_b") =!= col("id_c"))
      .withColumn("hamming",
        (bit_count(col("lo_b").bitwiseXOR(col("lo_c"))) +
          bit_count(col("hi_b").bitwiseXOR(col("hi_c")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_b"), col("id_c"), col("hamming")).distinct()
  }

  /** Embedding near-dup pairs: cosine ≥ minCosine. Candidate generation
    * via random-hyperplane LSH with an OR-construction over `tables`
    * independent plane sets: a pair is a candidate if it shares a bucket
    * in ANY table, then every candidate is reranked with the exact
    * cosine. For a pair at cosine c the per-plane agreement probability
    * is 1−θ/π (θ = arccos c), so the miss probability is
    * (1−(1−θ/π)^numPlanes)^tables — with numPlanes=4, tables=24 a pair
    * at c=0.8 is missed with p≈5e−6, which is why the bucketed operator
    * can run under the exact all-pairs oracle (q63) at sf gate scale.
    *
    * Scale shape: only (id, table, bucket) rides the candidate shuffle —
    * vectors join back by id for the rerank. Cost is Σ bucket² per
    * table, never n². */
  def embeddingCosinePairs(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double, numPlanes: Int = 8, dim: Int = 64,
      tables: Int = 1): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
      .repartition(col("id")) // one exchange, reused by both rerank joins
    val sigs = hyperplaneSignatures(col("v"),
      (0 until tables).map(t => makePlanes(numPlanes, dim, seed = 42L + t)))
    val buckets = e.select(col("id"),
      posexplode(sigs).as(Seq("table", "bucket")))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("table", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Embedding-level DECONTAMINATION: flag corpus vectors whose cosine
    * against ANY eval/benchmark vector reaches `minCosine` — the
    * semantic companion to the n-gram [[decontaminate]]: a paraphrased
    * or reformatted benchmark item shares no 8-gram but sits at
    * cosine ≈ 1 in embedding space. Output: (idCol, eval_id, cos), one
    * row per contaminated (corpus, eval) pair; survivors are the
    * anti-join.
    *
    * Scale shape (the q101 incremental contract, embedding variant):
    * an eval suite is benchmark-sized — thousands of rows, KBs-MBs —
    * so its bucket table and vectors BROADCAST, and the corpus side
    * computes its hyperplane signatures inside its own scan and never
    * rides an exchange for candidate generation. The only shuffle is
    * the (id, eval_id) candidate dedup, bounded by true matches plus
    * the per-table collision rate, never by the corpus. At
    * minCosine ≥ 0.999 the LSH identity is exact for bit-identical
    * vectors (they share every bucket in every table); lower
    * thresholds inherit the recorded multi-table miss probability of
    * [[embeddingCosinePairs]]. */
  def embeddingDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      vecCol: String, idCol: String, minCosine: Double,
      numPlanes: Int = 8, dim: Int = 64, tables: Int = 1): DataFrame = {
    import graft.functions.VectorFunctions._
    val planes = (0 until tables).map(t =>
      makePlanes(numPlanes, dim, seed = 42L + t))
    val ev = evalSet.select(col(idCol).as("eval_id"),
        col(vecCol).as("ve"), norm(col(vecCol)).as("ne"))
      .localCheckpoint(false) // eval-bounded; reused for buckets and rerank
    val evBuckets = ev.select(col("eval_id"),
      posexplode(hyperplaneSignatures(col("ve"), planes))
        .as(Seq("table", "bucket")))
    val co = corpus.select(col(idCol).as("id"), col(vecCol).as("vc"),
      norm(col(vecCol)).as("nc"),
      posexplode(hyperplaneSignatures(col(vecCol), planes))
        .as(Seq("table", "bucket")))
    co.join(broadcast(evBuckets), Seq("table", "bucket"))
      .groupBy(col("id"), col("eval_id"))
      .agg(first(col("vc")).as("vc"), first(col("nc")).as("nc"))
      .join(broadcast(ev), Seq("eval_id"))
      .select(col("id").as(idCol), col("eval_id"),
        (dot(col("vc"), col("ve")) / (col("nc") * col("ne"))).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Semantic (embedding-level) dedup survivors, the SemDeDup shape
    * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus by
    * embedding near-duplicate edges (cosine ≥ minCosine) and keep ONE
    * representative per connected cluster — the min id — reporting the
    * cluster size so the curation pass can audit what it dropped.
    * Output (idCol, cluster_size); singletons survive with size 1.
    *
    * Where SemDeDup prunes within k-means cells, the candidate
    * structure here is [[embeddingCosinePairs]]'s multi-table
    * hyperplane LSH — same Σ bucket² (never n²) cost shape, but with a
    * recorded per-pair miss probability instead of a quantization
    * boundary blind spot, and every candidate reranked with the exact
    * cosine before an edge exists. Clustering is
    * [[connectedComponents]] over those edges; the survivor pick is
    * one hash agg keyed by component. */
  def semanticSurvivors(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double, numPlanes: Int = 8, dim: Int = 64,
      tables: Int = 1): DataFrame = {
    val pairs = embeddingCosinePairs(emb, vecCol, idCol, minCosine,
      numPlanes, dim, tables)
    connectedComponents(emb.select(col(idCol)), idCol, pairs)
      .groupBy(col("component"))
      .agg(min(col("id")).as(idCol), count(lit(1)).as("cluster_size"))
      .select(col(idCol), col("cluster_size"))
  }

  /** Decontamination: flag corpus documents sharing at least one
    * distinct n-gram with an eval/probe set — the contamination check
    * every training corpus runs against its benchmark suites before
    * training. Same inverted-index shape as the dedup family: explode
    * distinct shingles on both sides, semi-join on the shingle, count
    * distinct matches per document. The probe side (eval sets are
    * small) broadcasts; only (id, shingle) rides the corpus side, so
    * the check is one scan of the corpus at any scale. Use n large
    * enough (≥ 5 tokens) that chance collisions vanish and a match
    * means real overlap. */
  def contaminatedDocs(docs: DataFrame, textCol: String, idCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 5): DataFrame = {
    val ex = docs.select(col(idCol).as("id"),
      explode(distinctShingles(col(textCol), n)).as("s"))
    val probeSh = probes.select(
      explode(distinctShingles(col(probeTextCol), n)).as("s")).distinct()
    ex.join(broadcast(probeSh), Seq("s"))
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_matched"))
  }

  /** Connected components over a near-dup pair graph: every node gets
    * the minimum id reachable from it, so each duplicate CLUSTER —
    * not just each pairwise edge — has one canonical representative.
    * Pairwise survivor-picking (drop the higher id of each edge, q32's
    * shape) is correct only when clusters are cliques; chains A–B–C
    * need the transitive closure this computes.
    *
    * Algorithm: iterative min-label propagation. Each round joins the
    * (symmetrized) edge list against current labels and takes the min
    * of own + neighbor labels; labels only ever decrease, so the sum
    * over all labels is a monotone convergence witness (equal sum ⟹
    * fixpoint — no extra change-count join). Rounds needed = graph
    * diameter; near-dup graphs are overwhelmingly tiny clusters, so
    * convergence is fast. Each round is one equi-join + one hash agg
    * (both shuffle on id) and a localCheckpoint to cut lineage — the
    * standard scalable CC shape. For adversarial long-chain graphs use
    * [[connectedComponentsStar]] (O(log n) rounds regardless of
    * diameter); this one stays the default for dedup graphs because a
    * round is cheaper (one join vs two grouped re-link passes).
    */
  def connectedComponents(ids: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIters: Int = 50): DataFrame = {
    val sym = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint() // edges are reused every round — plan them once
    var labels = ids
      .select(col(idCol).cast("long").as("id"),
        col(idCol).cast("long").as("comp"))
      .localCheckpoint(false) // lazy: the seed checksum materializes it
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp")).cast("decimal(38,0)")).head()
        .getDecimal(0)
    var prev = checksum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      // LAZY checkpoint (r18): the eager form ran one job to
      // materialize and a second for the checksum; the checksum action
      // materializes the lazy checkpoint itself, so each round is ONE
      // job and the next round still reads the cached partitions.
      val next = labels.union(nbr)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(false)
      val s = checksum(next)
      converged = s == prev
      prev = s
      labels = next
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIters " +
      "rounds — graph has a chain longer than maxIters")
    labels.select(col("id"), col("comp").as("component"))
  }

  /** Connected components by alternating large-star / small-star rounds
    * (the MapReduce-CC construction) — converges in O(log n) rounds
    * regardless of graph shape, where plain label propagation needs
    * diameter rounds. Use this for graphs that may contain long chains;
    * [[connectedComponents]] stays the default for near-dup graphs
    * (tiny clusters, diameter ≈ 2-3, fewer jobs per round).
    *
    * Each round: LARGE-STAR links every strictly-larger neighbor of u
    * to m(u) = min(u ∪ N(u)); SMALL-STAR re-links every
    * smaller-or-equal neighbor (and u itself) to the minimum of that
    * down-set. Edges are kept oriented (hi, lo) and both emitted forms
    * preserve hi > lo, so the edge set is a monotone object whose
    * 64-bit-hash checksum is the convergence witness. At the fixpoint
    * the edges form a star forest: every node points at its component's
    * minimum id. */
  def connectedComponentsStar(ids: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIters: Int = 32): DataFrame = {
    var edges = pairs.select(
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("hi"),
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(false)
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal sum: a long sum of 64-bit hashes overflows under ANSI
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo"))
          .cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = checksum(edges)
    var converged = prev._1 == 0
    var i = 0
    while (!converged && i < maxIters) {
      // large-star over the symmetrized adjacency
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // m <= u < v, so every emitted edge is already oriented (v, m)
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")).distinct()
      // small-star over the oriented down-sets
      val mins2 = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val relinked = ls.join(mins2, "hi").filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
      edges = relinked
        .union(mins2.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(false) // lazy: the checksum materializes it
      val s = checksum(edges)
      converged = s == prev
      prev = s
      i += 1
    }
    require(converged, s"star rounds did not converge in $maxIters " +
      "iterations")
    val roots = edges.groupBy(col("hi").as("id"))
      .agg(min(col("lo")).as("root"))
    ids.select(col(idCol).cast("long").as("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
  }

  /** Brute-force exact variant of embeddingCosinePairs (for oracle checks
    * and small sides; O(n²) — never run this at scale). Norms are
    * computed once per row BEFORE the join (not once per pair), and the
    * left side is repartitioned so the nested-loop join parallelizes
    * instead of grinding one partition. cos = dot/(na·nb) keeps the
    * oracle's exact FP operation order. */
  def embeddingCosinePairsExact(emb: DataFrame, vecCol: String,
      idCol: String, minCosine: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    e.repartition(col("id")).as("x").crossJoin(broadcast(e.as("y")))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")))
          .as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Cross-document repeated-substring spans — SUBSTRING-level exact
    * dedup (the ExactSubstr construction of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499),
    * re-expressed Spark-first. A monolithic suffix array does not
    * distribute; the equivalent inverted-index formulation does: every
    * overlapping k-token window is a key, windows whose gram occurs in
    * ≥ minDocs distinct documents are duplicated regions, and
    * overlapping flagged windows merge into maximal spans with one
    * gaps-and-islands window pass. Output one row per maximal span:
    * (doc_id, span_start, span_end, n_windows), token positions
    * inclusive.
    *
    * Scale: one shuffle keyed by gram for the distinct-doc count
    * (map-side partial agg), a semi join back on the same key, then a
    * doc_id-partitioned window whose exchange the final aggregate
    * reuses. At 100 TB, swap the gram join key for md5(gram)
    * (engine-portable, fixed 16 bytes) to cut shuffle width. `maxDf`
    * is the frequency guard of [[ngramJaccardPairsCapped]] applied to
    * grams: a gram present in MORE than `maxDf` distinct documents is
    * boilerplate (license headers, nav chrome) — it would bloat the
    * dup-set semi join and funnel every one of its (doc, pos) rows
    * through one reducer while carrying no dedup signal, so it is
    * excluded from flagging. Pick it comfortably above the duplication
    * depth you want to catch; the default never excludes anything. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, maxDf: Int = Int.MaxValue): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    require(minDocs >= 2, s"minDocs below 2 flags every window: $minDocs")
    require(maxDf >= minDocs,
      s"maxDf $maxDf below minDocs $minDocs excludes every window")
    val grams = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(positionalShingles(col(textCol), k)).as(Seq("pos", "gram")))
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs && col("nd") <= maxDf)
      .select(col("gram"))
    val flagged = grams.join(dup, Seq("gram"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // a window starts a new island iff it does not overlap the previous
    // flagged window: pos > prev_pos + k - 1
    flagged
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull
          .or(col("pos") > lag(col("pos"), 1).over(w) + (k - 1)), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + (k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }

  /** Scrub the corpus of [[repeatedSpans]] regions: drop every token
    * inside a repeated span and rejoin the survivors — the remove step
    * of substring-level dedup. Output (doc_id, clean_text, n_kept);
    * documents whose every token sat in a repeated span disappear
    * (nothing left to keep), mirroring the drop-empty behavior of
    * pipeline scrubbers. Spans are disjoint per document by
    * construction, so the containment join multiplies nothing. */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, maxDf: Int = Int.MaxValue): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, k, minDocs, maxDf)
      .select(col("doc_id").as("s_doc"), col("span_start"),
        col("span_end"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    toks.join(spans,
        toks("doc_id") === spans("s_doc") &&
          col("pos") >= col("span_start") && col("pos") <= col("span_end"),
        "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }
}
