package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact dedup — the C4 cleaning family's
  * span rule (Raffel et al. 2020, arXiv:1910.10683 §2.2 removes
  * repeated three-sentence spans corpus-wide; the unit here is a
  * separator-delimited paragraph). Every occurrence of a paragraph
  * except the FIRST — ordered by (id, position) — is removed, and the
  * survivors re-join in original order, so boilerplate that q111's
  * line-level blocklist can't know about (site footers, consent
  * banners, syndicated intros) is kept exactly once in the whole
  * corpus instead of once per page. Complements the substring-level
  * ExactSubstr operators (Dedup.repeatedSpans): this one is
  * paragraph-aligned, reconstructive, and keeps one canonical copy.
  */
object ParagraphDedup {

  /** Remove all but the first occurrence (ordered by (`idCol`, pos))
    * of every distinct paragraph of `textCol` split on `sep`, and
    * reassemble each document from its surviving paragraphs. Output:
    * (idCol, cleaned, n_dropped).
    *
    * Keeper selection is min(struct(id, pos)) per paragraph — a hash
    * aggregate with MAP-SIDE partial combine, then an equi-join of the
    * instances back to their winner. At 100 TB the popular-footer key
    * is the COMMON case (one paragraph, 10⁹ instances): the aggregate
    * moves only per-partition minima across the wire, and the join is
    * a standard AQE-splittable skew join (big probe side × 1-row build
    * per key). The tempting one-pass alternative — row_number() over
    * Window.partitionBy(paragraph) — ships every instance of the
    * mega-key into a single task's sort; that straggler is why this
    * operator deliberately pays the extra join instead. Reassembly is
    * one id-keyed aggregate (sort_array over collected (pos, para)
    * structs — per-doc arrays, bounded by doc length). Determinism:
    * (id, pos) is unique, struct comparison is lexicographic, so the
    * winner is total-order-defined; no hashing is involved at all
    * (paragraph CONTENT is the shuffle key), so results are
    * engine-portable and collision-free by construction. */
  def dedupeParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val paras = df.select(col(idCol).cast("long").as("__id"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("__pos", "__para")))
    val winners = paras.groupBy(col("__para"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
    val marked = paras.join(winners, Seq("__para"))
      .withColumn("__keep",
        struct(col("__id"), col("__pos")) === col("__w"))
    marked.groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("__pos"), col("__para"))))),
            x => x.getField("__para")),
          sep).as("cleaned"),
        count(when(!col("__keep"), lit(1))).as("n_dropped"))
      .select(col("__id").as(idCol), col("cleaned"), col("n_dropped"))
  }

  /** Incremental (delta-vs-lake) paragraph dedup: clean a small BATCH
    * of new documents against an already-ingested corpus — every batch
    * paragraph that exists ANYWHERE in the corpus is dropped (all its
    * batch copies; the lake's copy is the keeper and is not rewritten),
    * and paragraphs new to the corpus keep only their first batch
    * occurrence by (id, pos), exactly [[dedupeParagraphs]]' keeper
    * rule restricted to the delta. Output: (idCol, cleaned, n_dropped)
    * for the BATCH docs only.
    *
    * Scale shape ([[graft.operators.Dedup.incrementalSurvivors]]' lake
    * contract at paragraph grain): the batch's distinct paragraphs
    * BROADCAST into a semi-join probed inside the corpus's scan stage
    * — corpus rows explode to paragraphs and die in their own stage;
    * the corpus is never shuffled, never collected — and only the
    * matched paragraphs (bounded by the batch's distinct-paragraph
    * count) come back, again via broadcast, to anti-mark the batch.
    * Intra-batch keeper selection and reassembly then run entirely at
    * batch scale with the same agg-min + join shape (no window over
    * paragraph content) as the corpus-wide operator. For deltas too
    * big to broadcast their paragraph set, compose with the
    * [[graft.operators.Dedup.incrementalSurvivorsLarge]] bloom pattern
    * instead. */
  def incrementalDedupeParagraphs(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, sep: String = "\n"): DataFrame = {
    val bParas = explodeParas(batch, idCol, textCol, sep)
    val bKeys = bParas.select(col("__para")).distinct()
      .localCheckpoint(false) // bounded by the batch; reused for both probes
    val inCorpus = corpus
      .select(explode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as("__para"))
      .join(broadcast(bKeys), Seq("__para"), "left_semi")
      .distinct() // ≤ |batch paragraphs| rows ever leave the scan
    assemble(bParas, broadcast(inCorpus.withColumn("__dup", lit(true))),
      idCol, sep)
  }

  /** [[incrementalDedupeParagraphs]] for LARGE deltas — when the
    * batch's paragraph set is itself too big to broadcast (a backfill,
    * not an API batch), the membership probe follows
    * [[graft.operators.Dedup.incrementalSurvivorsLarge]]'s bloom
    * recipe: a distributed bloom build over the batch paragraphs, a
    * codegen bloom probe inside the corpus scan (≈(1−fpp) of the
    * corpus dies in its own stage), then an exact shuffled semi-join
    * confirm against the batch's distinct paragraphs — false
    * positives die there, so the output is BIT-IDENTICAL to the exact
    * path at any fpp (ParagraphDedupSpec tortures fpp=0.5; the q137
    * gate runs fpp=0.3 under q126's own oracle). Both the confirm and
    * the anti-mark join shuffle rather than broadcast: in this regime
    * the batch is large by assumption. */
  def incrementalDedupeParagraphsLarge(batch: DataFrame,
      corpus: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bParas = explodeParas(batch, idCol, textCol, sep)
    val bf = bParas.stat.bloomFilter("__para", expectedKeys, fpp)
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    val bKeys = bParas.select(col("__para")).distinct()
    val inCorpus = corpus
      .select(explode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as("__para"))
      .filter(graft.functions.SketchFunctions.bloomMightContain(
        col("__para"), baos.toByteArray))
      .join(bKeys, Seq("__para"), "left_semi")
      .distinct()
    assemble(bParas, inCorpus.withColumn("__dup", lit(true)),
      idCol, sep)
  }

  private def explodeParas(df: DataFrame, idCol: String,
      textCol: String, sep: String): DataFrame =
    df.select(col(idCol).cast("long").as("__id"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("__pos", "__para")))

  /** Shared tail of the incremental variants: batch-local keeper
    * selection (agg-min + join, never a content window), corpus-dup
    * anti-mark, reassembly. `dupFrame` carries (__para, __dup=true)
    * for paragraphs the corpus already owns — pre-broadcast by the
    * caller when batch-bounded. */
  private def assemble(bParas: DataFrame, dupFrame: DataFrame,
      idCol: String, sep: String): DataFrame = {
    val winners = bParas.groupBy(col("__para"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
    val marked = bParas.join(winners, Seq("__para"))
      .join(dupFrame, Seq("__para"), "left")
      .withColumn("__keep",
        struct(col("__id"), col("__pos")) === col("__w") &&
          col("__dup").isNull)
    marked.groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("__pos"), col("__para"))))),
            x => x.getField("__para")),
          sep).as("cleaned"),
        count(when(!col("__keep"), lit(1))).as("n_dropped"))
      .select(col("__id").as(idCol), col("cleaned"), col("n_dropped"))
  }
}
