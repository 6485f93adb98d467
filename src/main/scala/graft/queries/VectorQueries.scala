package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{Dedup, Similarity}
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity-search operator surface over the `embeddings` table
  * (ArrayType(FloatType) of dim 64). Dot products fold sequentially in
  * double precision on both engines, so similarity values are
  * bit-identical to DuckDB's list_dot_product over DOUBLE[] casts.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q36: brute-force cosine top-k against a stored query vector — the
    * exact ANN baseline (TakeOrderedAndProject: k-heap per partition). */
  val q36_cosine_topk: Q = (s, d) =>
    Similarity.topKForId(Tables.embeddings(s, d), "embedding", "vec_id",
      queryId = 0, k = 20)

  val q36_oracle: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv
                  FROM embeddings WHERE vec_id = 0)
       SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qv, qv))) AS sim
       FROM embeddings, q WHERE vec_id <> 0
       ORDER BY sim DESC, vec_id LIMIT 20"""

  /** q37: most-similar pairs corpus-wide (top-15) — the
    * embedding-cosine near-dup detector in RANKING form, carried by the
    * bucketed LSH-candidates + exact-rerank plan (the one that survives
    * 100 TB), not an all-pairs scan. The corpus is the near-dup shape
    * (every vector has an id-remapped duplicate, as in q63), so at the
    * 0.999 threshold the LSH identity is PROVABLE: duplicates have
    * bit-identical hyperplane signatures and can never miss a bucket,
    * while random pairs collide with p = 2^-12 per table — the rerank
    * reads ~0.05% of all pairs instead of all of them. The ranking
    * itself is real: cos(v, v-copy) = dot/(√d·√d) differs per vector in
    * the last ulps, and both engines fold it bit-identically. r05
    * verdict: the previous exact all-pairs form of this gate was the
    * suite's only quadratic plan (18.6× wall at 10× data);
    * [[Dedup.embeddingCosinePairsExact]] stays test-side oracle only
    * (DedupSpec pins LSH == exact on the raw low-cosine table too). */
  val q37_cosine_pairs: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val corpus = e.select(col("vec_id"), col("embedding"))
      .union(e.select((col("vec_id") + lit(10000000L)).as("vec_id"),
        col("embedding")))
    Dedup.embeddingCosinePairs(corpus, "embedding", "vec_id",
        minCosine = 0.999, numPlanes = 12, dim = 64, tables = 4)
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(15)
  }

  val q37_oracle: String =
    """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
                  UNION ALL
                  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[])
                  FROM embeddings)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
       FROM u a JOIN u b ON a.vec_id < b.vec_id
       WHERE list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) >= 0.999
       ORDER BY cos DESC, id_a, id_b LIMIT 15"""

  /** q197: margin-based parallel-pair mining, PROBE-BATCH form
    * ([[graft.operators.Similarity.marginMining]], Artetxe & Schwenk
    * arXiv:1811.01136 — the CCMatrix/LASER bitext criterion): a FIXED
    * 40-probe batch (even vec_ids < 80 — ScaleUp shifts replica ids by
    * 10M, so the batch stays 40 rows at every scale factor) against the
    * odd-id corpus; for each probe its best target BY MARGIN (cosine
    * relative to both endpoints' k-NN neighborhoods, k=5), top-30
    * corpus-wide. This is the operator's documented contract — the
    * broadcast side is a bounded batch, enforced by maxBuild — and the
    * plan is one linear corpus scan. (r13 verdict item 2: the previous
    * wiring fed half the corpus as the "batch", an N²/4 cross product
    * measured superlinear at sf1; the corpus×corpus shape now gates as
    * q216 through bucketed candidates.) Cosines fold bit-identically;
    * neighborhood sums are fixed-point longs (floor(cos·1e18), exact
    * integer sums — a scaled-DECIMAL sum would cost a second rounding
    * at the decimal→double cast in DuckDB); the margin is a fixed chain
    * of correctly-rounded double ops the oracle replays in the same
    * order — hash-exact gate. */
  val q197_margin_mining: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    Similarity.marginMining(
      e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 80),
      e.filter(col("vec_id") % 2 === 1),
      "embedding", "vec_id", "embedding", "vec_id", k = 5, n = 30)
  }

  val q197_oracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                  FROM embeddings),
       sims AS (
         SELECT l.vec_id AS src_id, r.vec_id AS dst_id,
           list_dot_product(r.v, l.v)
             / (sqrt(list_dot_product(r.v, r.v))
                * sqrt(list_dot_product(l.v, l.v))) AS cos
         FROM e l JOIN e r
           ON l.vec_id % 2 = 0 AND l.vec_id < 80
              AND r.vec_id % 2 = 1),
       rk AS (SELECT src_id, dst_id, cos,
           CAST(floor(cos * 1e18) AS BIGINT) AS cf,
           row_number() OVER (PARTITION BY src_id
             ORDER BY cos DESC, dst_id) AS rs,
           row_number() OVER (PARTITION BY dst_id
             ORDER BY cos DESC, src_id) AS rd
         FROM sims),
       sx AS (SELECT src_id, sum(cf) AS sx,
           CAST(count(*) AS BIGINT) AS cx
         FROM rk WHERE rs <= 5 GROUP BY src_id),
       sy AS (SELECT dst_id, sum(cf) AS sy,
           CAST(count(*) AS BIGINT) AS cy
         FROM rk WHERE rd <= 5 GROUP BY dst_id),
       m AS (SELECT rk.src_id, rk.dst_id, rk.cos,
           rk.cos / ((CAST(sx.sx AS DOUBLE) / 1e18
               / CAST(sx.cx AS DOUBLE)
             + CAST(sy.sy AS DOUBLE) / 1e18
               / CAST(sy.cy AS DOUBLE))
             / 2.0) AS margin
         FROM rk JOIN sx USING (src_id) JOIN sy USING (dst_id)
         WHERE rk.rs <= 5),
       best AS (SELECT src_id, dst_id, cos, margin,
           row_number() OVER (PARTITION BY src_id
             ORDER BY margin DESC, dst_id) AS b
         FROM m)
       SELECT src_id, dst_id, cos, margin,
         CAST(row_number() OVER (ORDER BY margin DESC, src_id)
           AS BIGINT) AS rk
       FROM best WHERE b = 1 ORDER BY margin DESC, src_id LIMIT 30"""

  /** q216: corpus×corpus margin mining through the BUCKETED scale path
    * ([[graft.operators.Similarity.marginMiningLsh]]) — the r13 verdict
    * item 2 successor gate. Even vec_ids as the source language, odd as
    * the target, candidates from 16 sign-bit LSH tables (4 planes each,
    * 16 buckets; per-bucket cap 64 per side, BINDING and deterministic
    * by id), then the identical margin tail as q197 over the candidate
    * set. The 16×4 budget is the measured quality point
    * (margin_recall_at_30 = 0.93 vs exact all-pairs mining in
    * QUALITY.json; 4×6 measured 0.17 — margin normalization needs wider
    * neighborhoods than plain near-dup detection, so the OR-construction
    * carries the budget; the worst-case candidate bound
    * numTables·2^planes·cap² = 1M pairs is IDENTICAL for both configs).
    * The oracle replays the whole chain — sign buckets, cap ranks,
    * bucket equi-join, distinct pairs, fixed-point margin — so the gate
    * is hash-exact, not rows-only; and the plan has NO cross join:
    * candidate generation is an inverted-index equi-join on
    * (table, bucket) bounded regardless of corpus size. */
  val q216_margin_mining_lsh: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    Similarity.marginMiningLsh(
      e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1),
      "embedding", "vec_id", "embedding", "vec_id", k = 5, n = 30,
      numTables = 16, planesPerTable = 4, dim = 64, maxBucket = 64)
  }

  val q216_oracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                  FROM embeddings),
       b AS (SELECT vec_id, v, t,
             (CASE WHEN v[t*4+1] >= 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[t*4+2] >= 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[t*4+3] >= 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[t*4+4] >= 0 THEN 8 ELSE 0 END) AS bucket
         FROM e CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
           (8),(9),(10),(11),(12),(13),(14),(15)) tb(t)),
       bl AS (SELECT * FROM (
           SELECT vec_id, v, t, bucket,
             row_number() OVER (PARTITION BY t, bucket
               ORDER BY vec_id) AS r
           FROM b WHERE vec_id % 2 = 0) WHERE r <= 64),
       br AS (SELECT * FROM (
           SELECT vec_id, v, t, bucket,
             row_number() OVER (PARTITION BY t, bucket
               ORDER BY vec_id) AS r
           FROM b WHERE vec_id % 2 = 1) WHERE r <= 64),
       sims AS (
         SELECT le.vec_id AS src_id, ri.vec_id AS dst_id,
           max(list_dot_product(le.v, ri.v)
             / (sqrt(list_dot_product(le.v, le.v))
                * sqrt(list_dot_product(ri.v, ri.v)))) AS cos
         FROM bl le JOIN br ri
           ON le.t = ri.t AND le.bucket = ri.bucket
         GROUP BY le.vec_id, ri.vec_id),
       rk AS (SELECT src_id, dst_id, cos,
           CAST(floor(cos * 1e18) AS BIGINT) AS cf,
           row_number() OVER (PARTITION BY src_id
             ORDER BY cos DESC, dst_id) AS rs,
           row_number() OVER (PARTITION BY dst_id
             ORDER BY cos DESC, src_id) AS rd
         FROM sims),
       sx AS (SELECT src_id, sum(cf) AS sx,
           CAST(count(*) AS BIGINT) AS cx
         FROM rk WHERE rs <= 5 GROUP BY src_id),
       sy AS (SELECT dst_id, sum(cf) AS sy,
           CAST(count(*) AS BIGINT) AS cy
         FROM rk WHERE rd <= 5 GROUP BY dst_id),
       m AS (SELECT rk.src_id, rk.dst_id, rk.cos,
           rk.cos / ((CAST(sx.sx AS DOUBLE) / 1e18
               / CAST(sx.cx AS DOUBLE)
             + CAST(sy.sy AS DOUBLE) / 1e18
               / CAST(sy.cy AS DOUBLE))
             / 2.0) AS margin
         FROM rk JOIN sx USING (src_id) JOIN sy USING (dst_id)
         WHERE rk.rs <= 5),
       best AS (SELECT src_id, dst_id, cos, margin,
           row_number() OVER (PARTITION BY src_id
             ORDER BY margin DESC, dst_id) AS b
         FROM m)
       SELECT src_id, dst_id, cos, margin,
         CAST(row_number() OVER (ORDER BY margin DESC, src_id)
           AS BIGINT) AS rk
       FROM best WHERE b = 1 ORDER BY margin DESC, src_id LIMIT 30"""

  /** q38: per-label embedding stats — norms through exact DECIMAL so the
    * cross-row mean is bit-stable. */
  val q38_embedding_stats: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"),
        norm(col("embedding")).cast(DecimalType(18, 9)).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        (sum(col("nrm")).cast("double") / count(lit(1))).as("avg_norm"),
        min(col("nrm")).cast("double").as("min_norm"),
        max(col("nrm")).cast("double").as("max_norm"))

  val q38_oracle: String =
    """WITH e AS (SELECT label,
         CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              AS DECIMAL(18,9)) AS nrm
       FROM embeddings)
       SELECT label, count(*) AS n_vectors,
         CAST(sum(nrm) AS DOUBLE) / count(*) AS avg_norm,
         CAST(min(nrm) AS DOUBLE) AS min_norm,
         CAST(max(nrm) AS DOUBLE) AS max_norm
       FROM e GROUP BY label"""

  /** q39: knn join + majority-label vote — for the first 8 vectors, the
    * top-5 neighbors' modal label (kNN classification shape: broadcast
    * probes, rank window, two hash aggs). */
  val q39_knn_labels: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val knn = Similarity.knnJoin(
      emb.filter(col("vec_id") < 8), emb,
      qVec = "embedding", qId = "vec_id",
      iVec = "embedding", iId = "vec_id", k = 5)
    val labeled = knn.join(
      Tables.embeddings(s, d).select(col("vec_id").as("item_id"),
        col("label")), "item_id")
    val votes = labeled.groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"),
        col("votes"))
  }

  val q39_oracle: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
                  FROM embeddings),
       sims AS (
         SELECT q.vec_id AS query_id, i.vec_id AS item_id, i.label,
           list_dot_product(i.v, q.v)
             / (sqrt(list_dot_product(i.v, i.v))
                * sqrt(list_dot_product(q.v, q.v))) AS sim
         FROM e q JOIN e i ON q.vec_id < 8 AND i.vec_id <> q.vec_id),
       knn AS (
         SELECT query_id, item_id, label FROM (
           SELECT query_id, item_id, label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, item_id) AS rank
           FROM sims) WHERE rank <= 5),
       votes AS (
         SELECT query_id, label, count(*) AS votes
         FROM knn GROUP BY query_id, label)
       SELECT query_id, label AS pred_label, votes FROM (
         SELECT query_id, label, votes,
           row_number() OVER (PARTITION BY query_id
             ORDER BY votes DESC, label) AS rn
         FROM votes) WHERE rn = 1"""

  /** q40: budgeted ANN top-k (approximate scale path; rows-only
    * check — recall vs the exact baseline is measured per round in
    * QUALITY.json). 64 independent LSH tables of 2^12 buckets, 16
    * query-directed probes each — the same 25% rows-scanned budget as
    * the old single-table 64-of-256 config, but the OR-construction
    * lifts measured recall@20 from 0.425 to 0.775 on near-isotropic
    * synthetic embeddings (LSH's hardest case; sweep in LshTune). */
  val q40_ann_lsh_topk: Q = (s, d) =>
    Similarity.lshTopKForIdTables(Tables.embeddings(s, d), "embedding",
      "vec_id", queryId = 0, k = 20, numTables = 64, numPlanes = 12,
      dim = 64, probesPerTable = 16)

  /** q46: the same top-k cosine through the SQL surface with graft's
    * registered native functions (GraftExtensions) — proves the
    * SparkSessionExtensions/FunctionRegistry path end-to-end and shares
    * the exact oracle with q36. */
  val q46_sql_vec_dot: Q = (s, d) => {
    graft.GraftExtensions.register(s)
    Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
    s.sql(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           vec_dot(embedding, qv)
             / (sqrt(vec_dot(embedding, embedding)) * sqrt(vec_dot(qv, qv)))
             AS sim
         FROM embeddings, q WHERE vec_id <> 0
         ORDER BY sim DESC, vec_id LIMIT 20""")
  }

  /** q51: IVF ANN in exact mode — probing all KMeans lists provably
    * reproduces brute force, so this runs the whole IVF path (train,
    * assign, probe, rerank) under q36's oracle. The approximate mode
    * (nProbes < nLists) is exercised in ScalaTest recall checks. */
  val q51_ivf_topk: Q = (s, d) =>
    Similarity.ivfTopKForId(Tables.embeddings(s, d), "embedding",
      "vec_id", queryId = 0, k = 20, nLists = 8, nProbes = 8)

  /** q74: full persisted-index lifecycle under an exact oracle —
    * build (vec_id < 300) → upsert (the rest) → delete (vec_id % 7 == 0,
    * tombstones) → full probe. With nProbes == nLists every surviving
    * list is read, so the probe provably equals brute force over
    * (corpus ∪ upserts) ∖ deletes — which is exactly what the DuckDB
    * oracle computes with plain predicates. This is the q51 identity
    * extended across the index's whole mutation surface. */
  val q74_index_delete_probe: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val dir = graft.TempDirs.scratch("graft-ivf-lifecycle-")
    Similarity.buildIvfIndex(e.filter(col("vec_id") < 300),
      "embedding", "vec_id", dir, nLists = 8)
    Similarity.upsertIvfIndex(e.filter(col("vec_id") >= 300),
      "embedding", "vec_id", dir)
    Similarity.deleteFromIvfIndex(
      e.filter(col("vec_id") % 7 === 0).select(col("vec_id")),
      "vec_id", dir)
    val qv = e.filter(col("vec_id") === 1)
      .select(col("embedding")).as[Array[Float]].head().toSeq
    Similarity.ivfProbe(s, dir, qv, k = 20, nProbes = 8,
      excludeId = Some(1L))
  }

  val q74_oracle: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv
                  FROM embeddings WHERE vec_id = 1)
       SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qv, qv))) AS sim
       FROM embeddings, q
       WHERE vec_id <> 1 AND vec_id % 7 <> 0
       ORDER BY sim DESC, vec_id LIMIT 20"""

  /** q54: per-label embedding centroids in long form (label, dim
    * position, mean) — posexplode + decimal-exact mean, oracle via
    * generate_subscripts. The array-form typed Aggregator (VecMean)
    * computes the same centroids and is asserted equal in ScalaTest. */
  val q54_label_centroids: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "e")))
      .groupBy(col("label"), (col("p") + 1).cast("long").as("pos"))
      // float → shortest string (unique, ≤9 significant digits) →
      // wide decimal: no rounding happens, so no cross-engine rounding
      // ties (double→decimal directly produced 2 tie mismatches /1280).
      // …and bring the exact sum back to double THROUGH A STRING as
      // well: decimal→string is exact in both engines and string→double
      // is correctly rounded in both, whereas DuckDB's direct
      // decimal→double conversion is off by an ulp once the int128
      // magnitude passes 2^53.
      .agg((sum(col("e").cast("string").cast(DecimalType(28, 18)))
        .cast("string").cast("double") / count(lit(1))).as("avg_val"))

  val q54_oracle: String =
    """SELECT label, pos,
       CAST(CAST(sum(CAST(CAST(e AS VARCHAR) AS DECIMAL(28,18)))
                 AS VARCHAR) AS DOUBLE)
         / count(*) AS avg_val
       FROM (SELECT label, unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS pos
             FROM embeddings)
       GROUP BY label, pos"""

  /** q63: embedding near-dup pairs through the BUCKETED scale path —
    * hyperplane-LSH candidates + exact rerank — under the exact
    * all-pairs oracle. The corpus is the embeddings table unioned with
    * an id-remapped copy of itself (the near-dup-detection shape: every
    * vector has a duplicate under a different id). At the 0.999
    * near-dup threshold the identity is PROVABLE, not probabilistic:
    * duplicate vectors have bit-identical signatures, so every true
    * pair shares all its buckets, while a random pair collides with
    * p = 2^-12 per table — the candidate join reads ~0.05% of all
    * pairs. This is the q31 trick with the miss probability driven to
    * exactly zero, and (unlike an all-pairs scan) the plan is the one
    * that survives 100 TB. */
  val q63_cosine_pairs_lsh: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val corpus = e.select(col("vec_id"), col("embedding"))
      .union(e.select((col("vec_id") + lit(10000000L)).as("vec_id"),
        col("embedding")))
    Dedup.embeddingCosinePairs(corpus, "embedding", "vec_id",
        minCosine = 0.999, numPlanes = 12, dim = 64, tables = 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q63_oracle: String =
    """WITH u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
                  UNION ALL
                  SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[])
                  FROM embeddings)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cos
       FROM u a JOIN u b ON a.vec_id < b.vec_id
       WHERE list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) >= 0.999
       ORDER BY id_a, id_b"""

  /** q71: int8 embedding quantization quality — per-vector max-abs
    * scale and worst-case reconstruction error (the 4x storage shrink
    * every 100 TB embedding corpus wants, with the error budget made
    * visible). Rounding is explicit floor(x·s + 0.5) so both engines
    * compute identical codes — round() builtins disagree on ties. */
  val q71_int8_quantize: Q = (s, d) => {
    import graft.functions.VectorFunctions._
    val e = Tables.embeddings(s, d)
    val scale = int8Scale(col("embedding"))
    e.select(col("vec_id"), scale.as("scale"),
      int8MaxError(col("embedding"), scale).as("max_err"))
  }

  val q71_oracle: String =
    """SELECT vec_id,
         127.0 / list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)))) AS scale,
         list_max(list_transform(embedding,
           x -> abs(CAST(floor(CAST(x AS DOUBLE)
                  * (127.0 / list_max(list_transform(embedding,
                      y -> abs(CAST(y AS DOUBLE))))) + 0.5) AS DOUBLE)
                / (127.0 / list_max(list_transform(embedding,
                      y -> abs(CAST(y AS DOUBLE)))))
                - CAST(x AS DOUBLE)))) AS max_err
       FROM embeddings"""

  /** q81: index COMPACTION identity — q74's lifecycle (build → upsert →
    * tombstone-delete) followed by [[Similarity.compactIndex]] (fold
    * tombstones into the affected list partitions, clear them) and a
    * post-compact delete, then a full probe. The oracle is pure
    * predicates, so hash_match proves compaction moved the anti-join's
    * work into the layout without changing a single result row — and
    * that tombstones laid down AFTER a compaction still apply. */
  val q81_index_compact_probe: Q = (s, d) => {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val dir = graft.TempDirs.scratch("graft-ivf-compact-")
    Similarity.buildIvfIndex(e.filter(col("vec_id") < 300),
      "embedding", "vec_id", dir, nLists = 8)
    Similarity.upsertIvfIndex(e.filter(col("vec_id") >= 300),
      "embedding", "vec_id", dir)
    Similarity.deleteFromIvfIndex(
      e.filter(col("vec_id") % 7 === 0).select(col("vec_id")),
      "vec_id", dir)
    Similarity.compactIndex(s, dir)
    Similarity.deleteFromIvfIndex(
      e.filter(col("vec_id") % 11 === 0).select(col("vec_id")),
      "vec_id", dir)
    val qv = e.filter(col("vec_id") === 1)
      .select(col("embedding")).as[Array[Float]].head().toSeq
    Similarity.ivfProbe(s, dir, qv, k = 20, nProbes = 8,
      excludeId = Some(1L))
  }

  val q81_oracle: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) qv
                  FROM embeddings WHERE vec_id = 1)
       SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qv, qv))) AS sim
       FROM embeddings, q
       WHERE vec_id <> 1 AND vec_id % 7 <> 0 AND vec_id % 11 <> 0
       ORDER BY sim DESC, vec_id LIMIT 20"""

  /** q83: exact covariance entries over the first 8 embedding dims
    * (operators.Linalg.exactCovarianceEntries) — every sum runs through
    * float→shortest-string decimals, so 36 covariance entries bit-match
    * DuckDB. Pins the linear-algebra aggregation the PCA/whitening path
    * builds on (the d×d mapPartitions Gram pass is the scale path and
    * is asserted equal to this one within 1e-9 in LinalgSpec). */
  val q83_covariance_entries: Q = (s, d) =>
    graft.operators.Linalg.exactCovarianceEntries(
      Tables.embeddings(s, d), "embedding", "vec_id", dims = 8)

  val q83_oracle: String =
    """WITH x AS (SELECT vec_id AS rid,
         CAST(generate_subscripts(embedding[1:8], 1) AS BIGINT) AS i,
         CAST(CAST(unnest(embedding[1:8]) AS VARCHAR)
              AS DECIMAL(16,15)) AS xdec
       FROM embeddings),
       p AS (SELECT a.i AS i, b.i AS j, sum(a.xdec * b.xdec) AS spdec,
               count(*) AS n
             FROM x a JOIN x b ON a.rid = b.rid AND b.i >= a.i
             GROUP BY a.i, b.i),
       s AS (SELECT i, sum(xdec) AS sdec FROM x GROUP BY i)
       SELECT p.i AS i, p.j AS j,
         CAST(CAST(p.spdec AS VARCHAR) AS DOUBLE) / CAST(p.n AS DOUBLE)
           - (CAST(CAST(sl.sdec AS VARCHAR) AS DOUBLE)
                / CAST(p.n AS DOUBLE))
             * (CAST(CAST(sr.sdec AS VARCHAR) AS DOUBLE)
                / CAST(p.n AS DOUBLE)) AS cov
       FROM p JOIN s sl ON p.i = sl.i JOIN s sr ON p.j = sr.i"""

  /** q85: LSH ANN in exact mode — probing ALL 2^numPlanes buckets
    * provably reproduces brute force (every vector lives in exactly one
    * bucket), so the whole hyperplane-LSH path (signature, bucket
    * enumeration, probe-order tiebreak, rerank) runs under q36's exact
    * oracle — the q51 identity trick applied to the LSH family. The
    * budgeted mode (q40, 64-of-256) stays rows-only by nature; its
    * recall is asserted in SimilaritySpec. */
  val q85_lsh_full_probe: Q = (s, d) =>
    Similarity.lshTopKForId(Tables.embeddings(s, d), "embedding",
      "vec_id", queryId = 0, k = 20, numPlanes = 8, dim = 64,
      probes = 256)

  /** q93: MULTI-table LSH (the OR-construction of q40's scale path) in
    * exact mode — every one of the 3 tables probes all 2^6 buckets, so
    * the union of candidates is provably the whole corpus and the
    * query runs under q36's exact oracle. This pins the union/OR logic
    * (per-table signatures, per-table probe sets, the OR filter, the
    * shared rerank) the way q85 pins the single-table path; the
    * budgeted multi-table mode is q40, whose recall at a fixed
    * scanned fraction is recorded in QUALITY.json. */
  val q93_lsh_tables_full: Q = (s, d) =>
    Similarity.lshTopKForIdTables(Tables.embeddings(s, d), "embedding",
      "vec_id", queryId = 0, k = 20, numTables = 3, numPlanes = 6,
      dim = 64, probesPerTable = 64)

  /** q99: semantic dedup survivors (SemDeDup shape —
    * operators.Dedup.semanticSurvivors) over the q63 doubled corpus:
    * every vector has a planted duplicate under a shifted id, so every
    * cluster is a provable near-dup group and the survivor set is its
    * min-id representative with the audited cluster size. The whole
    * pipeline — hyperplane-LSH candidates, exact-cosine rerank,
    * connected components, one component-keyed survivor agg — runs
    * under the exact all-pairs + recursive-CC DuckDB oracle, at the
    * 0.999 threshold where LSH == exact is provable (bit-identical
    * signatures share every bucket; the q63 argument). */
  val q99_semantic_survivors: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val corpus = e.select(col("vec_id"), col("embedding"))
      .union(e.select((col("vec_id") + lit(10000000L)).as("vec_id"),
        col("embedding")))
    Dedup.semanticSurvivors(corpus, "embedding", "vec_id",
      minCosine = 0.999, numPlanes = 12, dim = 64, tables = 4)
  }

  val q99_oracle: String =
    """WITH RECURSIVE
       u AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
             UNION ALL
             SELECT vec_id + 10000000, CAST(embedding AS DOUBLE[])
             FROM embeddings),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM u a JOIN u b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.999),
       e AS (SELECT id_a AS src, id_b AS dst FROM p
             UNION SELECT id_b, id_a FROM p),
       reach(id, r) AS (
         SELECT vec_id, vec_id FROM u
         UNION
         SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id),
       comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
       SELECT CAST(min(id) AS BIGINT) AS vec_id,
         CAST(count(*) AS BIGINT) AS cluster_size
       FROM comp GROUP BY component"""

  /** q118: deterministic integer k-means assignment (Cluster.kmeansAssign
    * scaladoc has the exact contract) — k=8, one Lloyd update from the
    * lowest-id seeds, scale 10⁴. The oracle replays the whole algorithm
    * in SQL: quantize, argmin vs seed centroids with (d2, cid)
    * tiebreak, per-dim truncating-division centroid update, final
    * argmin. 75 of 500 vectors change cluster between the two
    * assignment passes at sf0.001, so the update step is load-bearing —
    * any drift in quantization, distance, tiebreak, or the division
    * convention moves an assignment and breaks the hash. */
  val q118_kmeans_assign: Q = (s, d) =>
    graft.operators.Cluster.kmeansAssign(Tables.embeddings(s, d),
      "vec_id", "embedding", k = 8, updates = 1)

  private val kmeansAssignSql: String = {
    val D = 64
    def assign(src: String, cent: String) =
      s"""SELECT vec_id, v, cid, d2 FROM (
         SELECT q.vec_id, q.v, $cent.cid,
           list_sum(list_transform(range(1, ${D + 1}),
             i -> (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)])
                * (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)]))) AS d2,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_sum(list_transform(range(1, ${D + 1}),
               i -> (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)])
                  * (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)]))),
             $cent.cid) AS rn
         FROM $src CROSS JOIN $cent) WHERE rn = 1"""
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
         FROM embeddings),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cid, v
              FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 8)),
       a1 AS (${assign("q", "c0")}),
       s1 AS (SELECT cid, CAST(i AS INT) AS i, SUM(v[CAST(i AS INT)]) AS s,
                count(*) AS n
              FROM a1, unnest(range(1, ${D + 1})) u(i) GROUP BY cid, i),
       c1 AS (SELECT c0.cid, COALESCE(u.v, c0.v) AS v
              FROM c0 LEFT JOIN (
                SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS v
                FROM s1 GROUP BY cid) u ON u.cid = c0.cid),
       a2 AS (${assign("q", "c1")})"""
  }

  val q118_oracle: String =
    s"""$kmeansAssignSql
       SELECT vec_id, cid AS cluster, CAST(d2 AS BIGINT) AS d2 FROM a2"""

  /** q119: cluster-balanced subsample — the diversity-sampling
    * composition (cluster the corpus, then draw a fixed per-cluster
    * quota): q118's assignment feeding Sample.capPerKey, 30 lowest
    * vec_ids per cluster. One extra WindowGroupLimit-pruned window on
    * top of the assignment — the corpus never re-shuffles. */
  val q119_cluster_sample: Q = (s, d) => {
    val assigned = graft.operators.Cluster.kmeansAssign(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 8, updates = 1)
    graft.operators.Sample.capPerKey(assigned, col("cluster"),
        Seq(col("vec_id")), cap = 30)
      .select(col("vec_id"), col("cluster"))
  }

  val q119_oracle: String =
    s"""$kmeansAssignSql
       SELECT vec_id, cluster FROM (
         SELECT vec_id, cid AS cluster,
           row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
         FROM a2) WHERE rn <= 30"""

  /** q123/q124: product quantization (Pq scaladoc) — m=8 subspaces,
    * k=16 codes, one Lloyd update, scale 10⁴. q123 gates the full
    * train→encode pipeline (codes as 8 int columns + the exact
    * quantized reconstruction error); q124 gates ADC search: top-20
    * by Σ_s table_s[code_s] against vec 0's query vector, (adc_d2,
    * vec_id) total order. The oracles replay ALL EIGHT subspace
    * k-means runs plus lookup-table construction in generated SQL —
    * kept total under empty clusters via COALESCE to the seed
    * centroid, mirroring the operator. */
  private val pqM = 8
  private val pqDsub = 8
  private val pqK = 16

  val q123_pq_encode: Q = (s, d) => {
    val (enc, _) = graft.operators.Pq.encode(Tables.embeddings(s, d),
      "vec_id", "embedding", m = pqM, k = pqK, updates = 1)
    enc.select(col("vec_id") +:
      (0 until pqM).map(i =>
        element_at(col("codes"), i + 1).as(s"c$i")) :+
      col("recon_d2"): _*)
  }

  val q124_pq_adc_topk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (enc, books) = graft.operators.Pq.encode(emb,
      "vec_id", "embedding", m = pqM, k = pqK, updates = 1)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.operators.Pq.adcTopN(enc, "vec_id", books, qvec, n = 20)
  }

  private def pqAssignSql(src: String, cent: String, dd: Int): String =
    s"""SELECT vec_id, v, cid, d2 FROM (
      SELECT q.vec_id, q.v, $cent.cid,
        list_sum(list_transform(range(1, ${dd + 1}),
          i -> (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)])
             * (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)]))) AS d2,
        row_number() OVER (PARTITION BY q.vec_id ORDER BY
          list_sum(list_transform(range(1, ${dd + 1}),
            i -> (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)])
               * (q.v[CAST(i AS INT)] - $cent.v[CAST(i AS INT)]))),
          $cent.cid) AS rn
      FROM $src AS q CROSS JOIN $cent) WHERE rn = 1"""

  /** Shared WITH-prefix: `qvDef` (one or more CTEs ending in qv =
    * (vec_id, v: quantized long list)) + all m subspace k-means runs. */
  private def pqBaseSqlFrom(qvDef: String): String = {
    val subs = (0 until pqM).map { s =>
      val off = s * pqDsub
      s"""qs$s AS (SELECT vec_id, list_slice(v, ${off + 1},
             ${off + pqDsub}) AS v FROM qv),
       c0_$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                    AS INT) AS cid, v
                 FROM (SELECT vec_id, v FROM qs$s ORDER BY vec_id
                       LIMIT $pqK)),
       a1_$s AS (${pqAssignSql(s"qs$s", s"c0_$s", pqDsub)}),
       s1_$s AS (SELECT cid, CAST(i AS INT) AS i,
                   SUM(v[CAST(i AS INT)]) AS s, count(*) AS n
                 FROM a1_$s, unnest(range(1, ${pqDsub + 1})) u(i)
                 GROUP BY cid, i),
       c1_$s AS (SELECT c0.cid, COALESCE(u.v, c0.v) AS v
                 FROM c0_$s c0 LEFT JOIN (
                   SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS v
                   FROM s1_$s GROUP BY cid) u ON u.cid = c0.cid),
       a2_$s AS (${pqAssignSql(s"qs$s", s"c1_$s", pqDsub)})"""
    }
    s"""WITH $qvDef,
       ${subs.mkString(",\n       ")}"""
  }

  private val pqQuantizeQv: String =
    """qv AS (SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       FROM embeddings)"""

  private val pqBaseSql: String = pqBaseSqlFrom(pqQuantizeQv)

  /** Quantize + closed-form Sylvester Hadamard rotation (y_i = Σ_j
    * (−1)^popcount(i&j) · x_j — what Pq.hadamardRotate's butterfly
    * computes in log₂(d) stages). */
  private val pqRotatedQv: String =
    """qv0 AS (SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       FROM embeddings),
       qv AS (SELECT vec_id, list_transform(range(0, 64),
           i -> CAST(list_sum(list_transform(range(0, 64),
             j -> (1 - 2 * (bit_count(i & j) % 2))
               * v[CAST(j + 1 AS INT)])) AS BIGINT)) AS v
         FROM qv0)"""

  val q123_oracle: String = {
    val encCols = (0 until pqM).map(s => s"a2_$s.cid AS c$s").mkString(", ")
    val joins = (1 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = a2_0.vec_id").mkString(" ")
    val recon = (0 until pqM).map(s => s"a2_$s.d2").mkString(" + ")
    s"""$pqBaseSql
       SELECT a2_0.vec_id, $encCols, CAST($recon AS BIGINT) AS recon_d2
       FROM a2_0 $joins"""
  }

  /** ADC-search oracle tail over any pq base prefix (the lookup-table
    * CTEs slice the QV of vec 0 — already rotated when the base is the
    * rotated one, mirroring adcTopNRotated's query-side rotation). */
  private def pqAdcSql(base: String): String = {
    val tsubs = (0 until pqM).map { s =>
      val off = s * pqDsub
      s"""t$s AS (SELECT c.cid,
         CAST(list_sum(list_transform(range(1, ${pqDsub + 1}),
           i -> (qs.v[CAST(i AS INT)] - c.v[CAST(i AS INT)])
              * (qs.v[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) AS BIGINT)
           AS d2
         FROM c1_$s c CROSS JOIN
           (SELECT list_slice(v, ${off + 1}, ${off + pqDsub}) AS v
            FROM qv WHERE vec_id = 0) qs)"""
    }
    val aJoins = (1 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = a2_0.vec_id").mkString(" ")
    val tJoins = (0 until pqM)
      .map(s => s"JOIN t$s ON t$s.cid = a2_$s.cid").mkString(" ")
    val adcSum = (0 until pqM).map(s => s"t$s.d2").mkString(" + ")
    s"""$base,
       ${tsubs.mkString(",\n       ")}
       SELECT a2_0.vec_id, CAST($adcSum AS BIGINT) AS adc_d2
       FROM a2_0 $aJoins $tJoins
       ORDER BY adc_d2, a2_0.vec_id LIMIT 20"""
  }

  val q124_oracle: String = pqAdcSql(pqBaseSql)

  /** q128: the exact Hadamard pre-rotation itself (Pq.hadamardRotate
    * scaladoc: the ±1 Sylvester matrix is the bit-exact stand-in for
    * OPQ's learned rotation), emitted relationally as (vec_id, pos, y)
    * so the gate pins every rotated component. The oracle computes
    * y_i = Σ_j (−1)^popcount(i&j)·x_j closed-form; the operator runs
    * the log₂(64) = 6-stage butterfly — any error in stage wiring,
    * sign placement, or index arithmetic breaks the hash. Plan shape:
    * 6 chained per-row projections + posexplode, zero shuffles. */
  val q128_hadamard_rotate: Q = (s, d) => {
    val q = Tables.embeddings(s, d).select(col("vec_id"),
      graft.operators.Cluster.quantize(col("embedding"), 10000L).as("v"))
    graft.operators.Pq.hadamardRotate(q, "v", 64)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "y")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("y"))
  }

  val q128_oracle: String =
    """WITH qv AS (SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       FROM embeddings)
       SELECT vec_id, CAST(i AS BIGINT) AS pos,
         CAST(list_sum(list_transform(range(0, 64),
           j -> (1 - 2 * (bit_count(i & j) % 2))
             * v[CAST(j + 1 AS INT)])) AS BIGINT) AS y
       FROM qv, unnest(range(0, 64)) u(i)"""

  /** q129: PQ train→encode in the ROTATED space (Pq.encodeRotated) —
    * OPQ's "rotate, then product-quantize" pipeline with the exact ±1
    * rotation, gated end-to-end: the oracle replays rotation AND all
    * eight subspace Lloyd runs in SQL (pqBaseSqlFrom over the rotated
    * qv). Distances scale uniformly by d=64 under H so assignments are
    * the rotated-space truth, and recon_d2 stays an exact per-vector
    * compression-quality signal. */
  val q129_pq_rotated_encode: Q = (s, d) => {
    val (enc, _) = graft.operators.Pq.encodeRotated(
      Tables.embeddings(s, d), "vec_id", "embedding",
      m = pqM, k = pqK, updates = 1)
    enc.select(col("vec_id") +:
      (0 until pqM).map(i =>
        element_at(col("codes"), i + 1).as(s"c$i")) :+
      col("recon_d2"): _*)
  }

  val q129_oracle: String = {
    val encCols = (0 until pqM).map(s => s"a2_$s.cid AS c$s").mkString(", ")
    val joins = (1 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = a2_0.vec_id").mkString(" ")
    val recon = (0 until pqM).map(s => s"a2_$s.d2").mkString(" + ")
    s"""${pqBaseSqlFrom(pqRotatedQv)}
       SELECT a2_0.vec_id, $encCols, CAST($recon AS BIGINT) AS recon_d2
       FROM a2_0 $joins"""
  }

  /** Coarse(k=8) assignment + residual qv for the IVF-PQ oracles:
    * kmeansAssignSql's CTE chain (q/c0/a1/s1/c1/a2 — no collision
    * with the subspace CTEs), residuals against the FINAL centroids,
    * renamed into the qv contract pqBaseSqlFrom expects. */
  private val ivfPqQv: String =
    kmeansAssignSql.stripPrefix("WITH ") + """,
       rqv AS (SELECT a2.vec_id, a2.cid AS list,
           list_transform(range(1, 65),
             i -> a2.v[CAST(i AS INT)] - c1.v[CAST(i AS INT)]) AS v
         FROM a2 JOIN c1 ON c1.cid = a2.cid),
       qv AS (SELECT vec_id, v FROM rqv)"""

  /** q140: IVF-PQ encode (Pq.encodeIvfPq scaladoc — the FAISS-style
    * coarse+residual composition): deterministic coarse k-means, PQ
    * codes of exact long RESIDUALS, coarse list carried per row. The
    * oracle replays coarse train→assign, residual computation, and
    * all eight subspace Lloyd runs over the residuals — any defect in
    * the residual arithmetic or list routing breaks the hash. */
  val q140_ivfpq_encode: Q = (s, d) => {
    val (enc, _, _) = graft.operators.Pq.encodeIvfPq(
      Tables.embeddings(s, d), "vec_id", "embedding",
      kCoarse = 8, m = pqM, k = pqK, updates = 1)
    enc.select(col("vec_id") +: col("list") +:
      (0 until pqM).map(i =>
        element_at(col("codes"), i + 1).as(s"c$i")) :+
      col("recon_d2"): _*)
  }

  val q140_oracle: String = {
    val encCols = (0 until pqM).map(s => s"a2_$s.cid AS c$s").mkString(", ")
    val joins = (0 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = r.vec_id").mkString(" ")
    val recon = (0 until pqM).map(s => s"a2_$s.d2").mkString(" + ")
    s"""${pqBaseSqlFrom(ivfPqQv)}
       SELECT r.vec_id, CAST(r.list AS INT) AS list, $encCols,
         CAST($recon AS BIGINT) AS recon_d2
       FROM rqv r $joins"""
  }

  /** q141: IVF-PQ probed ADC search — rank coarse lists by exact
    * integer distance to the query, probe the nearest 3 of 8, ADC
    * each candidate against the query's residual FOR ITS OWN LIST
    * (per-list lookup tables; the when-chain on the list column is
    * the in-plan analogue of the per-partition table an executor
    * would hold). Only probed-list rows are scanned; (adc_d2, vec_id)
    * total order. The oracle rebuilds probe selection, per-list query
    * residuals, and all nprobe·m lookup tables in SQL. */
  val q141_ivfpq_search: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (enc, coarse, books) = graft.operators.Pq.encodeIvfPq(emb,
      "vec_id", "embedding", kCoarse = 8, m = pqM, k = pqK, updates = 1)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.operators.Pq.ivfPqTopN(enc, "vec_id", coarse, books, qvec,
      nprobe = 3, n = 20)
  }

  val q141_oracle: String = {
    val tsubs = (0 until pqM).map { s =>
      val off = s * pqDsub
      s"""t$s AS (SELECT qres.cid AS pcid, c.cid AS code,
         CAST(list_sum(list_transform(range(1, ${pqDsub + 1}),
           i -> (list_slice(qres.v, ${off + 1}, ${off + pqDsub})[CAST(i AS INT)]
                  - c.v[CAST(i AS INT)])
              * (list_slice(qres.v, ${off + 1}, ${off + pqDsub})[CAST(i AS INT)]
                  - c.v[CAST(i AS INT)]))) AS BIGINT) AS d2
         FROM qres CROSS JOIN c1_$s c)"""
    }
    val aJoins = (0 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = r.vec_id").mkString(" ")
    val tJoins = (0 until pqM)
      .map(s => s"JOIN t$s ON t$s.pcid = r.list AND t$s.code = a2_$s.cid")
      .mkString(" ")
    val adcSum = (0 until pqM).map(s => s"t$s.d2").mkString(" + ")
    s"""${pqBaseSqlFrom(ivfPqQv)},
       qz AS (SELECT v FROM q WHERE vec_id = 0),
       cd AS (SELECT c1.cid, CAST(list_sum(list_transform(range(1, 65),
           i -> (qz.v[CAST(i AS INT)] - c1.v[CAST(i AS INT)])
              * (qz.v[CAST(i AS INT)] - c1.v[CAST(i AS INT)])))
           AS BIGINT) AS d2
         FROM c1 CROSS JOIN qz),
       probe AS (SELECT cid FROM (SELECT cid,
           row_number() OVER (ORDER BY d2, cid) AS rn FROM cd)
         WHERE rn <= 3),
       qres AS (SELECT c1.cid, list_transform(range(1, 65),
           i -> qz.v[CAST(i AS INT)] - c1.v[CAST(i AS INT)]) AS v
         FROM c1 CROSS JOIN qz
         WHERE c1.cid IN (SELECT cid FROM probe)),
       ${tsubs.mkString(",\n       ")}
       SELECT r.vec_id, CAST(r.list AS INT) AS list,
         CAST($adcSum AS BIGINT) AS adc_d2
       FROM rqv r $aJoins $tJoins
       WHERE r.list IN (SELECT cid FROM probe)
       ORDER BY adc_d2, r.vec_id LIMIT 20"""
  }

  /** q132: hard-negative mining (Similarity.hardNegatives scaladoc —
    * the DPR contrastive-training recipe): for each of the first 8
    * anchor vectors, the 5 most cosine-similar vectors with a
    * DIFFERENT label, as a (query_id, item_id, rank) rank surface
    * (raw cosine doubles never cross the gate; the oracle recomputes
    * sims on CAST DOUBLE[] and ranks identically — q39's proven
    * pattern plus the label-mismatch condition, which is what turns
    * a kNN join into negative mining). */
  val q132_hard_negatives: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb.filter(col("vec_id") < 8), emb,
        qVec = "embedding", qId = "vec_id", qLabel = "label",
        iVec = "embedding", iId = "vec_id", iLabel = "label", k = 5)
      .select(col("query_id"), col("item_id"), col("rank"))
  }

  val q132_oracle: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
                  FROM embeddings),
       sims AS (
         SELECT q.vec_id AS query_id, i.vec_id AS item_id,
           list_dot_product(i.v, q.v)
             / (sqrt(list_dot_product(i.v, i.v))
                * sqrt(list_dot_product(q.v, q.v))) AS sim
         FROM e q JOIN e i ON q.vec_id < 8 AND i.vec_id <> q.vec_id
           AND i.label <> q.label)
       SELECT query_id, item_id, CAST(rank AS BIGINT) AS rank FROM (
         SELECT query_id, item_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, item_id) AS rank
         FROM sims) WHERE rank <= 5"""

  /** q131: ADC top-k in the ROTATED space — the OPQ pipeline closed
    * end-to-end (rotate corpus → train/encode → rotate QUERY → ADC).
    * The oracle is q124's ADC tail over the rotated base: its lookup
    * tables slice the rotated qv of vec 0, exactly the driver-side
    * FWHT the operator applies to the query vector. (adc_d2, vec_id)
    * total order; same TakeOrderedAndProject shape as q124 — the
    * search touches only the 8-int codes column. */
  val q131_pq_rotated_adc: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (enc, books) = graft.operators.Pq.encodeRotated(emb,
      "vec_id", "embedding", m = pqM, k = pqK, updates = 1)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.operators.Pq.adcTopNRotated(enc, "vec_id", books, qvec, n = 20)
  }

  val q131_oracle: String = pqAdcSql(pqBaseSqlFrom(pqRotatedQv))

  /** The learned-rotation OPQ fixture (Pq.learnedRotationFixture
    * scaladoc): a closed-form 64×64 integer matrix ≈ 127·Q for a
    * hash-derived orthogonal Q — the offline-weights stand-in for a
    * Procrustes-trained OPQ rotation, shared verbatim by the Spark
    * operators and the generated oracle SQL. */
  private lazy val opqRot: Array[Array[Long]] =
    graft.operators.Pq.learnedRotationFixture(64)

  /** Quantize + learned matrix rotation as SQL: y_i = Σ_j R[i][j]·x_j
    * with R inlined as a literal list-of-lists (the fixture is the
    * model; the oracle replays its exact application). */
  private def pqMatrixQv(rot: Array[Array[Long]]): String = {
    val lit = rot.map(_.mkString("[", ", ", "]"))
      .mkString("[", ",\n           ", "]")
    s"""qv0 AS (SELECT vec_id, list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       FROM embeddings),
       rm AS (SELECT $lit AS r),
       qv AS (SELECT vec_id, list_transform(range(0, 64),
           i -> CAST(list_sum(list_transform(range(0, 64),
             j -> r[CAST(i + 1 AS INT)][CAST(j + 1 AS INT)]
               * v[CAST(j + 1 AS INT)])) AS BIGINT)) AS v
         FROM qv0 CROSS JOIN rm)"""
  }

  private lazy val pqLearnedQv: String = pqMatrixQv(opqRot)

  /** The DATA-FITTED rotation (operators/PqFitted.scala — trained
    * offline by [[graft.FitRotation]]: PCA + snake eigenvalue
    * allocation over the reference embeddings, Ge et al. CVPR 2013
    * §4). q181/q182 gate its exact application; its recall trends in
    * QUALITY.json as pq_fitted_recall_at_20. */
  private lazy val pqFittedQv: String =
    pqMatrixQv(graft.operators.PqFitted.r64)

  /** q175: PQ train→encode under the LEARNED rotation
    * (Pq.encodeMatrixRotated) — q129's pipeline with an offline-
    * trained matrix instead of the closed-form Hadamard: rotation,
    * all eight subspace Lloyd runs, codes and recon_d2 are exact
    * integer functions of (corpus, R), and the oracle replays the
    * matrix application plus the full training in generated SQL. */
  val q175_opq_learned_encode: Q = (s, d) => {
    val (enc, _) = graft.operators.Pq.encodeMatrixRotated(
      Tables.embeddings(s, d), "vec_id", "embedding", opqRot,
      m = pqM, k = pqK, updates = 1)
    enc.select(col("vec_id") +:
      (0 until pqM).map(i =>
        element_at(col("codes"), i + 1).as(s"c$i")) :+
      col("recon_d2"): _*)
  }

  val q175_oracle: String = {
    val encCols = (0 until pqM).map(s => s"a2_$s.cid AS c$s").mkString(", ")
    val joins = (1 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = a2_0.vec_id").mkString(" ")
    val recon = (0 until pqM).map(s => s"a2_$s.d2").mkString(" + ")
    s"""${pqBaseSqlFrom(pqLearnedQv)}
       SELECT a2_0.vec_id, $encCols, CAST($recon AS BIGINT) AS recon_d2
       FROM a2_0 $joins"""
  }

  /** q176: ADC search against the learned-rotation index
    * (Pq.adcTopNMatrixRotated) — the query vector takes the same
    * quantize→R path driver-side, then the top-20 scan over 8-byte
    * codes (TakeOrderedAndProject, zero shuffles — q124's shape). */
  val q176_opq_learned_adc: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (enc, books) = graft.operators.Pq.encodeMatrixRotated(emb,
      "vec_id", "embedding", opqRot, m = pqM, k = pqK, updates = 1)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.operators.Pq.adcTopNMatrixRotated(enc, "vec_id", books,
      opqRot, qvec, n = 20)
  }

  val q176_oracle: String = pqAdcSql(pqBaseSqlFrom(pqLearnedQv))

  /** q181: PQ train→encode under the DATA-FITTED rotation — q175's
    * pipeline with the matrix OPQ actually trained on the corpus
    * (PqFitted.scala: offline PCA + snake eigenvalue allocation,
    * regenerated by graft.FitRotation). Same exact-integer contract:
    * the oracle replays rotation + all eight Lloyd runs with the
    * committed matrix inlined as a SQL literal. */
  val q181_opq_fitted_encode: Q = (s, d) => {
    val (enc, _) = graft.operators.Pq.encodeMatrixRotated(
      Tables.embeddings(s, d), "vec_id", "embedding",
      graft.operators.PqFitted.r64, m = pqM, k = pqK, updates = 1)
    enc.select(col("vec_id") +:
      (0 until pqM).map(i =>
        element_at(col("codes"), i + 1).as(s"c$i")) :+
      col("recon_d2"): _*)
  }

  val q181_oracle: String = {
    val encCols = (0 until pqM).map(s => s"a2_$s.cid AS c$s").mkString(", ")
    val joins = (1 until pqM)
      .map(s => s"JOIN a2_$s ON a2_$s.vec_id = a2_0.vec_id").mkString(" ")
    val recon = (0 until pqM).map(s => s"a2_$s.d2").mkString(" + ")
    s"""${pqBaseSqlFrom(pqFittedQv)}
       SELECT a2_0.vec_id, $encCols, CAST($recon AS BIGINT) AS recon_d2
       FROM a2_0 $joins"""
  }

  /** q182: ADC top-k under the data-fitted rotation — the complete
    * trained-OPQ retrieval path (rotate corpus by the trained R →
    * encode → rotate query → ADC over 8-byte codes; q124's
    * zero-shuffle TakeOrderedAndProject shape). */
  val q182_opq_fitted_adc: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (enc, books) = graft.operators.Pq.encodeMatrixRotated(emb,
      "vec_id", "embedding", graft.operators.PqFitted.r64,
      m = pqM, k = pqK, updates = 1)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.operators.Pq.adcTopNMatrixRotated(enc, "vec_id", books,
      graft.operators.PqFitted.r64, qvec, n = 20)
  }

  val q182_oracle: String = pqAdcSql(pqBaseSqlFrom(pqFittedQv))

  /** q150: embedding-level DECONTAMINATION
    * ([[Dedup.embeddingDecontaminate]]) — flag corpus vectors at
    * cosine ≥ 0.999 against an eval/benchmark set, the semantic
    * companion to q72's n-gram decontamination (a paraphrased
    * benchmark item shares no 8-gram but sits at cosine ≈ 1). The
    * eval set is every 10th embedding; the corpus is the full table
    * under remapped ids, so each eval item has exactly one planted
    * contaminant plus whatever true duplicate vectors the fixture
    * carries. Eval buckets and vectors broadcast; the corpus computes
    * signatures in its own scan and never shuffles for candidates.
    * At 0.999 the LSH identity is exact (the DedupSpec fixture guard:
    * pairs at ≥ 0.999 are bit-identical and share every bucket), so
    * the oracle is the exact cross join. */
  val q150_embedding_decontam: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val corpus = emb.select(
      (col("vec_id") + 40000000L).as("vec_id"), col("embedding"))
    val evalSet = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    Dedup.embeddingDecontaminate(corpus, evalSet, "embedding",
      "vec_id", minCosine = 0.999, numPlanes = 12, dim = 64,
      tables = 4)
  }

  val q150_oracle: String =
    """WITH ev AS (SELECT vec_id AS eval_id,
           CAST(embedding AS DOUBLE[]) v
         FROM embeddings WHERE vec_id % 10 = 0),
       co AS (SELECT vec_id + 40000000 AS vec_id,
           CAST(embedding AS DOUBLE[]) v
         FROM embeddings)
       SELECT co.vec_id, ev.eval_id,
         list_dot_product(co.v, ev.v)
           / (sqrt(list_dot_product(co.v, co.v))
              * sqrt(list_dot_product(ev.v, ev.v))) AS cos
       FROM co, ev
       WHERE list_dot_product(co.v, ev.v)
           / (sqrt(list_dot_product(co.v, co.v))
              * sqrt(list_dot_product(ev.v, ev.v))) >= 0.999"""

  /** q154: Johnson–Lindenstrauss sign projection
    * ([[graft.operators.Linalg.signProject]]) — the training-free
    * dimensionality reduction next to PCA's trained one (q83): 64 → 16
    * dims through a ±1 matrix that is a pure function of (i, j) via
    * md5 parity, so the oracle rebuilds the exact matrix and the
    * integer-quantized sums hash-match outright. One stateless
    * projection, k·d scalar multiply-adds per row, zero shuffles. */
  val q154_sign_project: Q = (s, d) =>
    graft.operators.Linalg.signProject(Tables.embeddings(s, d),
      "vec_id", "embedding", k = 16, dim = 64)

  val q154_oracle: String =
    """WITH q AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             * 10000) AS BIGINT) AS qi
         FROM embeddings,
           unnest(range(1, len(embedding) + 1)) u(i)),
       s AS (SELECT CAST(a.i AS BIGINT) AS i, CAST(b.j AS BIGINT) AS j,
           CASE WHEN substr(md5(a.i || ':' || b.j), 1, 1) < '8'
                THEN 1 ELSE -1 END AS sgn
         FROM range(0, 64) a(i), range(0, 16) b(j))
       SELECT q.vec_id, s.j, CAST(sum(s.sgn * q.qi) AS BIGINT) AS y
       FROM q JOIN s ON s.i = q.i GROUP BY q.vec_id, s.j"""

  /** q165: hybrid-retrieval rank fusion
    * ([[graft.operators.Fusion.rrfTopK]]) — the BM25 lexical top-100
    * (q77's scoring) fused with the dense cosine top-100 against the
    * stored query vector (q36's scoring, id 0) by Reciprocal Rank
    * Fusion in exact integer arithmetic: contribution = 10⁹ div
    * (60 + rank), fused scores are exact long sums, so the gate
    * hash-matches the scores themselves. The two rankings genuinely
    * disagree (lexical term hits vs embedding geometry), so the fused
    * order is a real interleave, not either input echoed. */
  val q165_rrf_fusion: Q = (s, d) => {
    val bm = graft.operators.Bm25.topK(
      graft.Tables.documents(s, d), "text", "doc_id",
      terms = Seq("spark", "query", "vector", "hash", "window"), k = 100)
    val dense = Similarity.topKForId(Tables.embeddings(s, d),
        "embedding", "vec_id", queryId = 0, k = 100)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rk"))
    graft.operators.Fusion.rrfTopK(
        Seq(bm.select(col("doc_id"), col("rk")), dense),
        "doc_id", "rk", k = 50)
      .select(col("id").as("doc_id"), col("fused"), col("rk"))
  }

  val q165_oracle: String =
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
       FROM base, st),
       lex AS (SELECT doc_id, rk FROM (
         SELECT doc_id, CAST(row_number() OVER
           (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
         FROM sc) WHERE rk <= 100),
       q AS (SELECT CAST(embedding AS DOUBLE[]) qv
             FROM embeddings WHERE vec_id = 0),
       ds AS (SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS sim
         FROM embeddings, q WHERE vec_id <> 0),
       den AS (SELECT vec_id AS doc_id, rk FROM (
         SELECT vec_id, CAST(row_number() OVER
           (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk
         FROM ds) WHERE rk <= 100),
       contrib AS (
         SELECT doc_id, 1000000000 // (60 + rk) AS p FROM lex
         UNION ALL
         SELECT doc_id, 1000000000 // (60 + rk) AS p FROM den),
       fused AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS fused
         FROM contrib GROUP BY doc_id)
       SELECT doc_id, fused, rk FROM (
         SELECT doc_id, fused, CAST(row_number() OVER
           (ORDER BY fused DESC, doc_id) AS BIGINT) AS rk
         FROM fused)
       WHERE rk <= 50"""

  /** q166: MMR diversified re-rank ([[graft.operators.Mmr.rerank]]) —
    * the top-60 cosine candidates against the stored query (q36's
    * scoring) greedily diversified to 8 picks at λ=7/10. The oracle
    * replays all 8 greedy steps in chained SQL CTEs over the same
    * pool + pairwise-sim tables, so every pick — including the
    * diversity penalties that pull lower-relevance items forward —
    * must match exactly. The pool build is the distributed stage
    * (TakeOrdered top-m); the greedy is O(k·m) over the bounded pool
    * (see the operator scaladoc for why that is the scale shape). */
  val q166_mmr_rerank: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val pool = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("v"),
        (dot(col("embedding"), col("qv"))
          / (norm(col("embedding")) * col("qn"))).as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(60)
    graft.operators.Mmr.rerank(pool, "id", "v", "rel", k = 8,
      lamNum = 7, lamDen = 10)
  }

  val q166_oracle: String = {
    // every sel_i is referenced three times (IN, NOT IN, union) —
    // without MATERIALIZED the CTE chain re-inlines the whole prefix
    // 3^k times (the q149 BPE-fold lesson, SQL-side this time)
    val steps = new StringBuilder
    for (i <- 2 to 8) {
      steps.append(s""",
       s$i AS MATERIALIZED (SELECT p.id FROM pool p
         JOIN sims ON sims.ia = p.id
           AND sims.ib IN (SELECT id FROM sel${i - 1})
         WHERE p.id NOT IN (SELECT id FROM sel${i - 1})
         GROUP BY p.id, p.rel
         ORDER BY 7 * p.rel - 3 * max(sims.sim) DESC, p.id LIMIT 1),
       sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1}
         UNION ALL SELECT $i, id FROM s$i)""")
    }
    s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) qv
         FROM embeddings WHERE vec_id = 0),
       pool AS MATERIALIZED (SELECT id, v, rel FROM (
         SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS rel
         FROM embeddings, qv WHERE vec_id <> 0
         ORDER BY rel DESC, vec_id LIMIT 60)),
       sims AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS sim
         FROM pool a JOIN pool b ON a.id <> b.id),
       s1 AS (SELECT id FROM pool ORDER BY 7 * rel DESC, id LIMIT 1),
       sel1 AS MATERIALIZED (SELECT 1 AS step, id FROM s1)${steps}
       SELECT CAST(step AS BIGINT) AS step, id FROM sel8"""
  }

  /** q174: grouped MMR — corpus-scale diversified selection
    * ([[graft.operators.Mmr.rerankGrouped]]): per-label candidate
    * pools (top-12 by q36's cosine relevance, the capPerKey /
    * WindowGroupLimit bound) each greedily diversified to 4 picks at
    * λ=7/10, with zero driver-side data and zero per-step shuffles —
    * the distributed composition of q166's bounded greedy. The oracle
    * replays all 4 greedy steps for ALL groups at once in chained
    * per-group CTEs (argmax via a partitioned row_number instead of
    * q166's LIMIT 1), so every pick in every group must match. */
  val q174_mmr_grouped: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), norm(col("embedding")).as("qn"))
    val cands = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
      .select(col("label"), col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"),
        (dot(col("embedding"), col("qv"))
          / (norm(col("embedding")) * col("qn"))).as("rel"))
    graft.operators.Mmr.rerankGrouped(cands, "label", "id", "v", "rel",
      k = 4, m = 12)
  }

  val q174_oracle: String = {
    val steps = new StringBuilder
    for (i <- 2 to 4) {
      steps.append(s""",
       m$i AS (SELECT p.g, p.id, p.rel, max(s.sim) AS ms
         FROM pool p
         JOIN sims s ON s.g = p.g AND s.ia = p.id
         JOIN sel${i - 1} sp ON sp.g = s.g AND sp.id = s.ib
         WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} q
           WHERE q.g = p.g AND q.id = p.id)
         GROUP BY p.g, p.id, p.rel),
       s$i AS (SELECT g, id FROM (
         SELECT g, id, row_number() OVER (PARTITION BY g
           ORDER BY 7 * rel - 3 * ms DESC, id) AS rn FROM m$i)
         WHERE rn = 1),
       sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1}
         UNION ALL SELECT g, $i, id FROM s$i)""")
    }
    s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) qv
         FROM embeddings WHERE vec_id = 0),
       pool AS MATERIALIZED (SELECT g, id, v, rel FROM (
         SELECT g, id, v, rel, row_number() OVER (PARTITION BY g
           ORDER BY rel DESC, id) AS rn
         FROM (SELECT label AS g, vec_id AS id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_dot_product(CAST(embedding AS DOUBLE[]), qv)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(qv, qv))) AS rel
           FROM embeddings, qv WHERE vec_id <> 0))
         WHERE rn <= 12),
       sims AS MATERIALIZED (SELECT a.g, a.id AS ia, b.id AS ib,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS sim
         FROM pool a JOIN pool b ON a.g = b.g AND a.id <> b.id),
       s1 AS (SELECT g, id FROM (
         SELECT g, id, row_number() OVER (PARTITION BY g
           ORDER BY 7 * rel DESC, id) AS rn FROM pool) WHERE rn = 1),
       sel1 AS MATERIALIZED (SELECT g, 1 AS step, id FROM s1)${steps}
       SELECT g AS label, CAST(step AS BIGINT) AS step, id FROM sel4"""
  }

  /** q177: SQ8 compressed-domain brute search
    * ([[graft.operators.Similarity.sq8TopKForId]]) — cosine ranking
    * computed directly on the int8 codes (cosine is invariant to the
    * positive per-vector quantization scale, so no reconstruction):
    * the 1-byte-per-dim storage tier between float32 brute force
    * (q36) and PQ (q124). The scores are exact doubles over integer
    * code values, so the oracle replays the q71-pinned code formula
    * and every similarity bit-for-bit. */
  val q177_sq8_topk: Q = (s, d) =>
    Similarity.sq8TopKForId(Tables.embeddings(s, d), "embedding",
      "vec_id", queryId = 0, k = 20)

  val q177_oracle: String =
    """WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         127.0 / list_max(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE)))) AS s
       FROM embeddings),
       c AS (SELECT vec_id,
         list_transform(v, x -> floor(x * s + 0.5)) AS cv
       FROM c0),
       q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         FROM embeddings WHERE vec_id = 0)
       SELECT vec_id,
         list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv))
              * sqrt(list_dot_product(qv, qv))) AS sim
       FROM c, q WHERE vec_id <> 0
       ORDER BY sim DESC, vec_id LIMIT 20"""

  /** q179: label-noise audit ([[graft.operators.Similarity
    * .labelNoiseAudit]]) — the confident-learning screen: each probe
    * vector's kNN-majority label vs its own label, aggregated per
    * label into the mislabeled-slice report. Candidates here come
    * from the exact [[graft.operators.Similarity.knnJoin]] over a
    * broadcastable 64-query batch (q39's gate shape); at corpus scale
    * the same audit runs unchanged over LSH/IVF candidate frames —
    * the operator is candidate-source-agnostic by contract. The
    * oracle replays the kNN, the votes, the (votes DESC, label)
    * majority, and the per-label aggregation. */
  val q179_label_noise: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val pairs = Similarity.knnJoin(e.filter(col("vec_id") < 64), e,
      "embedding", "vec_id", "embedding", "vec_id", k = 5)
    Similarity.labelNoiseAudit(pairs, e, "vec_id", "label", k = 5)
  }

  val q179_oracle: String =
    """WITH p AS (SELECT a.vec_id AS query_id, b.vec_id AS item_id,
         list_dot_product(CAST(b.embedding AS DOUBLE[]),
                          CAST(a.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(a.embedding AS DOUBLE[]))))
           AS sim
         FROM embeddings a JOIN embeddings b
           ON a.vec_id < 64 AND b.vec_id <> a.vec_id),
       t AS (SELECT query_id, item_id FROM (
         SELECT query_id, item_id, row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, item_id) AS rn
         FROM p) WHERE rn <= 5),
       v AS (SELECT t.query_id, e.label AS nl, count(*) AS votes
         FROM t JOIN embeddings e ON e.vec_id = t.item_id
         GROUP BY 1, 2),
       mj AS (SELECT query_id, nl FROM (
         SELECT query_id, nl, row_number() OVER (
           PARTITION BY query_id ORDER BY votes DESC, nl) AS rn
         FROM v) WHERE rn = 1)
       SELECT e.label AS label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN mj.nl <> e.label THEN 1 ELSE 0 END)
           AS BIGINT) AS n_disagree,
         CAST(sum(CASE WHEN mj.nl <> e.label THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*) AS noise_rate
       FROM mj JOIN embeddings e ON e.vec_id = mj.query_id
       GROUP BY e.label"""

  /** q234: retrieval evaluation — precision@10 / recall@10 /
    * reciprocal rank / average precision per probe
    * ([[graft.operators.Fusion.retrievalMetrics]], TREC definitions):
    * the 8-probe batch ranks the corpus by exact cosine
    * ([[graft.operators.Similarity.knnJoin]] — the q36 bit-identical
    * dot-product fold), relevance truth = same-label vectors
    * (retrieved or not — recall's denominator counts the misses). The
    * metric arithmetic is exact-rational over L = lcm(1..10) = 2520
    * (each is ONE IEEE division of two exact integers — the q220/q223
    * discipline), so every metric gates hash-exact, not band-checked.
    * Scale shape: after the probe-broadcast rank, everything is ≤ k
    * rows per probe through one equi-join + two hash-aggs. */
  val q234_retrieval_eval: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < 8)
    val run = Similarity.knnJoin(probes, e, "embedding", "vec_id",
      "embedding", "vec_id", k = 10)
    val truth = probes.select(col("vec_id").as("query_id"),
        col("label"))
      .join(e.select(col("vec_id").as("item_id"), col("label")),
        Seq("label"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"))
    graft.operators.Fusion.retrievalMetrics(run, truth, "query_id",
        "item_id", "rank", k = 10)
      .withColumnRenamed("grp", "probe_id")
  }

  val q234_oracle: String =
    """WITH p AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv,
           label AS qlab
         FROM embeddings WHERE vec_id < 8),
       s AS (SELECT p.qid, e.vec_id AS iid, e.label AS ilab, p.qlab,
           list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(p.qv, p.qv))) AS sim
         FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.qid),
       run AS (SELECT qid, iid, ilab, qlab, rk FROM (
           SELECT qid, iid, ilab, qlab, row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, iid) AS rk
           FROM s) WHERE rk <= 10),
       nrel AS (SELECT p.qid, CAST(count(*) AS BIGINT) AS n_rel
         FROM p JOIN embeddings e
           ON e.label = p.qlab AND e.vec_id <> p.qid
         GROUP BY 1),
       hits AS (SELECT qid, rk,
           row_number() OVER (PARTITION BY qid ORDER BY rk) AS hidx
         FROM run WHERE ilab = qlab),
       agg AS (SELECT qid, CAST(count(*) AS BIGINT) AS hits_at_k,
           CAST(min(rk) AS BIGINT) AS first_rel_rank,
           CAST(sum(hidx * (2520 // rk)) AS BIGINT) AS ap_num
         FROM hits GROUP BY 1)
       SELECT p.qid AS probe_id,
         coalesce(nrel.n_rel, 0) AS n_rel,
         coalesce(agg.hits_at_k, 0) AS hits_at_k,
         agg.first_rel_rank,
         CAST(coalesce(2520 // agg.first_rel_rank, 0) AS BIGINT)
           AS rr_num,
         coalesce(agg.ap_num, 0) AS ap_num,
         CAST(coalesce(agg.hits_at_k, 0) AS DOUBLE) / 10.0 AS p_at_k,
         CASE WHEN coalesce(nrel.n_rel, 0) > 0 THEN
           CAST(coalesce(agg.hits_at_k, 0) AS DOUBLE)
             / CAST(nrel.n_rel AS DOUBLE) END AS r_at_k,
         CAST(coalesce(2520 // agg.first_rel_rank, 0) AS DOUBLE)
           / 2520.0 AS rr,
         CASE WHEN coalesce(nrel.n_rel, 0) > 0 THEN
           CAST(coalesce(agg.ap_num, 0) AS DOUBLE)
             / CAST(2520 * least(nrel.n_rel, 10) AS DOUBLE) END AS ap
       FROM p LEFT JOIN nrel ON nrel.qid = p.qid
       LEFT JOIN agg ON agg.qid = p.qid"""

  /** q245: NDCG@10 with graded relevance
    * ([[graft.operators.Fusion.ndcgAtK]], Järvelin & Kekäläinen TOIS
    * 2002): the q234 probe-batch exact-cosine run, judged against a
    * GRADED truth — rel 2 for same-label items, rel 1 for the coarse
    * class (label mod 5) — so the metric rewards ranking exact
    * matches above near-matches, which binary P@k/AP cannot see. The
    * 1/log2(i+1) discounts are a fixed-point table computed once in
    * Scala and interpolated into BOTH engines as integer literals
    * (≤ 2^-32 quantization; log2 never evaluates cross-engine), so
    * DCG/IDCG are exact integers and ndcg is ONE IEEE division —
    * the metric NEXT.md called "non-exact by nature" gates
    * hash-exact. */
  val q245_ndcg_eval: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < 8)
    val run = Similarity.knnJoin(probes, e, "embedding", "vec_id",
      "embedding", "vec_id", k = 10)
    val truth = probes.select(col("vec_id").as("query_id"),
        col("label").as("__qlab"))
      .join(e.select(col("vec_id").as("item_id"),
          col("label").as("__ilab")),
        col("__qlab") % 5 === col("__ilab") % 5)
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        when(col("__ilab") === col("__qlab"), lit(2L)).otherwise(lit(1L))
          .as("rel"))
    graft.operators.Fusion.ndcgAtK(run, truth, "query_id", "item_id",
        "rank", "rel", k = 10)
      .withColumnRenamed("grp", "probe_id")
  }

  /** The q245 discount CASE, interpolated from the SAME
    * [[graft.operators.Fusion.ndcgDiscounts]] table the Spark side
    * uses. */
  private def ndcgCase(v: String): String =
    graft.operators.Fusion.ndcgDiscounts(10).zipWithIndex
      .map { case (dv, i) => s"WHEN ${i + 1} THEN $dv" }
      .mkString(s"(CASE $v ", " ", " END)")

  val q245_oracle: String =
    s"""WITH p AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) qv,
           label AS qlab
         FROM embeddings WHERE vec_id < 8),
       s AS (SELECT p.qid, e.vec_id AS iid,
           list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(p.qv, p.qv))) AS sim
         FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.qid),
       run AS (SELECT qid, iid, rk FROM (
           SELECT qid, iid, row_number() OVER (
             PARTITION BY qid ORDER BY sim DESC, iid) AS rk
           FROM s) WHERE rk <= 10),
       tr AS (SELECT p.qid, e.vec_id AS iid,
           CAST(CASE WHEN e.label = p.qlab THEN 2 ELSE 1 END AS BIGINT)
             AS rel
         FROM p JOIN embeddings e
           ON e.label % 5 = p.qlab % 5 AND e.vec_id <> p.qid),
       nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
         FROM tr GROUP BY 1),
       dcg AS (SELECT run.qid,
           CAST(sum(tr.rel * ${ndcgCase("run.rk")}) AS BIGINT)
             AS dcg_num
         FROM run JOIN tr ON tr.qid = run.qid AND tr.iid = run.iid
         GROUP BY 1),
       ideal AS (SELECT qid, rel, row_number() OVER (
           PARTITION BY qid ORDER BY rel DESC, iid) AS i
         FROM tr),
       idcg AS (SELECT qid,
           CAST(sum(rel * ${ndcgCase("i")}) AS BIGINT) AS idcg_num
         FROM ideal WHERE i <= 10 GROUP BY 1)
       SELECT p.qid AS probe_id, coalesce(nrel.n_rel, 0) AS n_rel,
         coalesce(dcg.dcg_num, 0) AS dcg_num, idcg.idcg_num,
         CASE WHEN idcg.idcg_num IS NOT NULL THEN
           CAST(coalesce(dcg.dcg_num, 0) AS DOUBLE)
             / CAST(idcg.idcg_num AS DOUBLE) END AS ndcg
       FROM p LEFT JOIN nrel ON nrel.qid = p.qid
       LEFT JOIN dcg ON dcg.qid = p.qid
       LEFT JOIN idcg ON idcg.qid = p.qid"""

  val all: Map[String, Q] = Map(
    "q245_ndcg_eval" -> q245_ndcg_eval,
    "q234_retrieval_eval" -> q234_retrieval_eval,
    "q177_sq8_topk" -> q177_sq8_topk,
    "q179_label_noise" -> q179_label_noise,
    "q175_opq_learned_encode" -> q175_opq_learned_encode,
    "q176_opq_learned_adc" -> q176_opq_learned_adc,
    "q181_opq_fitted_encode" -> q181_opq_fitted_encode,
    "q182_opq_fitted_adc" -> q182_opq_fitted_adc,
    "q174_mmr_grouped" -> q174_mmr_grouped,
    "q166_mmr_rerank" -> q166_mmr_rerank,
    "q165_rrf_fusion" -> q165_rrf_fusion,
    "q154_sign_project" -> q154_sign_project,
    "q150_embedding_decontam" -> q150_embedding_decontam,
    "q118_kmeans_assign" -> q118_kmeans_assign,
    "q128_hadamard_rotate" -> q128_hadamard_rotate,
    "q129_pq_rotated_encode" -> q129_pq_rotated_encode,
    "q131_pq_rotated_adc" -> q131_pq_rotated_adc,
    "q132_hard_negatives" -> q132_hard_negatives,
    "q140_ivfpq_encode" -> q140_ivfpq_encode,
    "q141_ivfpq_search" -> q141_ivfpq_search,
    "q119_cluster_sample" -> q119_cluster_sample,
    "q123_pq_encode" -> q123_pq_encode,
    "q124_pq_adc_topk" -> q124_pq_adc_topk,
    "q99_semantic_survivors" -> q99_semantic_survivors,
    "q93_lsh_tables_full" -> q93_lsh_tables_full,
    "q85_lsh_full_probe" -> q85_lsh_full_probe,
    "q83_covariance_entries" -> q83_covariance_entries,
    "q81_index_compact_probe" -> q81_index_compact_probe,
    "q74_index_delete_probe" -> q74_index_delete_probe,
    "q71_int8_quantize" -> q71_int8_quantize,
    "q63_cosine_pairs_lsh" -> q63_cosine_pairs_lsh,
    "q54_label_centroids" -> q54_label_centroids,
    "q51_ivf_topk" -> q51_ivf_topk,
    "q46_sql_vec_dot" -> q46_sql_vec_dot,
    "q36_cosine_topk" -> q36_cosine_topk,
    "q37_cosine_pairs" -> q37_cosine_pairs,
    "q38_embedding_stats" -> q38_embedding_stats,
    "q39_knn_labels" -> q39_knn_labels,
    "q40_ann_lsh_topk" -> q40_ann_lsh_topk,
    "q197_margin_mining" -> q197_margin_mining,
    "q216_margin_mining_lsh" -> q216_margin_mining_lsh)

  val oracles: Map[String, String] = Map(
    "q245_ndcg_eval" -> q245_oracle,
    "q234_retrieval_eval" -> q234_oracle,
    "q197_margin_mining" -> q197_oracle,
    "q216_margin_mining_lsh" -> q216_oracle,
    "q177_sq8_topk" -> q177_oracle,
    "q179_label_noise" -> q179_oracle,
    "q175_opq_learned_encode" -> q175_oracle,
    "q176_opq_learned_adc" -> q176_oracle,
    "q181_opq_fitted_encode" -> q181_oracle,
    "q182_opq_fitted_adc" -> q182_oracle,
    "q174_mmr_grouped" -> q174_oracle,
    "q166_mmr_rerank" -> q166_oracle,
    "q165_rrf_fusion" -> q165_oracle,
    "q154_sign_project" -> q154_oracle,
    "q150_embedding_decontam" -> q150_oracle,
    "q118_kmeans_assign" -> q118_oracle,
    "q128_hadamard_rotate" -> q128_oracle,
    "q129_pq_rotated_encode" -> q129_oracle,
    "q131_pq_rotated_adc" -> q131_oracle,
    "q132_hard_negatives" -> q132_oracle,
    "q140_ivfpq_encode" -> q140_oracle,
    "q141_ivfpq_search" -> q141_oracle,
    "q119_cluster_sample" -> q119_oracle,
    "q123_pq_encode" -> q123_oracle,
    "q124_pq_adc_topk" -> q124_oracle,
    "q99_semantic_survivors" -> q99_oracle,
    "q93_lsh_tables_full" -> q36_oracle,
    "q85_lsh_full_probe" -> q36_oracle,
    "q83_covariance_entries" -> q83_oracle,
    "q81_index_compact_probe" -> q81_oracle,
    "q74_index_delete_probe" -> q74_oracle,
    "q71_int8_quantize" -> q71_oracle,
    "q63_cosine_pairs_lsh" -> q63_oracle,
    "q54_label_centroids" -> q54_oracle,
    "q51_ivf_topk" -> q36_oracle,
    "q46_sql_vec_dot" -> q36_oracle,
    "q36_cosine_topk" -> q36_oracle,
    "q37_cosine_pairs" -> q37_oracle,
    "q38_embedding_stats" -> q38_oracle,
    "q39_knn_labels" -> q39_oracle)
}
