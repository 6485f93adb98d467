package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Graph
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph operator surface (SURVEY.md §2.2 north-star, web-curation
  * family): host-level PageRank and degree profiles over edges built by
  * the REAL extraction chain — extractLinks → canonicalizeUrl →
  * parse_url(HOST) — exactly as a crawl-curation pipeline would build
  * them from raw pages. The gates synthesize pages whose link targets
  * are closed-form in doc_id, so the DuckDB oracles recompute the whole
  * graph (and, for PageRank, the whole fixpoint) from first principles.
  *
  * Page grammar per doc (residue s = doc_id % M over a single shared
  * host namespace, so the graph has real cycles, confluences, a
  * self-loop and collapsed double-edges where the residue maps
  * coincide):
  *   link 1: HTTPS://SITE{(3s+1)%M}.EXAMPLE.ORG:443/p{id}?utm_source=x
  *           (mangled — only canonicalization yields the true host)
  *   link 2: https://site{(7s+5)%M}.example.org/q{id}
  *   link 3: https://site0.example.org/h{id}  — only when s % 5 == 0,
  *           making site0 a mega-hub so the PageRank surface has real
  *           spread instead of a flat permutation.
  * Source host: site{s}.example.org (the doc's own q114-style host).
  *
  * The modulus M is SCALE-COUPLED (r15 verdict item 3): M =
  * greatest(101, n DIV 50) over the corpus row count n, the single
  * closed form both the Spark builders and the DuckDB oracles
  * evaluate. At the correctness fixtures (500 docs) M = 101 — the
  * documented residue structure, incl. the self-loop at s=50 (2s ≡ −1
  * mod 101) — while the synthetic scale corpora grow the host set
  * with the data (sf0.1's 5000 docs still 101; the ×10 sf1 replica's
  * 50000 docs → 1000 hosts), so SCALEBENCH's graph fits actually see
  * node growth instead of a fixed 101-node universe at every sf.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The scale-coupled modulus attached as a `__m` column: ONE
    * single-row count aggregate broadcast to the corpus (the
    * decayedCounts scalar-attach shape — a bounded BNL join, never a
    * second pass). */
  private def withM(docs: DataFrame): DataFrame =
    docs.crossJoin(broadcast(
      docs.agg(greatest(lit(101L),
        expr("count(1) DIV 50")).as("__m"))))

  /** The oracle's spelling of the same scalar. */
  private val mSql =
    "(SELECT greatest(101, count(*) // 50) FROM documents)"

  /** Host-level edge INSTANCES via the real extraction chain — one row
    * per (doc, link); multiplicity preserved (q116 counts it, q115's
    * PageRank dedupes internally). Per-row extract + explode +
    * canonicalize: no shuffle in this stage beyond the one-row
    * modulus broadcast. */
  private def hostEdges(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val m = col("__m")
    val page = concat(
      lit("<html><body><p>t</p><A HREF=\"HTTPS://SITE"), (id * 3 + 1) % m,
      lit(".EXAMPLE.ORG:443/p"), id, lit("?utm_source=x\">a</A>"),
      lit("<a href='https://site"), (id * 7 + 5) % m,
      lit(".example.org/q"), id, lit("'>b</a>"),
      when((id % m) % 5 === 0,
        concat(lit("<a href=\"https://site0.example.org/h"), id,
          lit("\">c</a>"))).otherwise(lit("")),
      lit("</body></html>"))
    withM(Tables.documents(s, d))
      .select(id, m, explode(extractLinks(page)).as("raw"))
      .select(
        concat(lit("site"), id % m, lit(".example.org")).as("src"),
        parse_url(canonicalizeUrl(col("raw")), lit("HOST")).as("dst"))
  }

  /** Closed-form SQL for the same edge instances. */
  private val edgeSql: String =
    s"""SELECT 'site' || (doc_id % $mSql) || '.example.org' AS src,
         'site' || ((3 * (doc_id % $mSql) + 1) % $mSql)
           || '.example.org' AS dst
       FROM documents
       UNION ALL
       SELECT 'site' || (doc_id % $mSql) || '.example.org',
         'site' || ((7 * (doc_id % $mSql) + 5) % $mSql)
           || '.example.org'
       FROM documents
       UNION ALL
       SELECT 'site' || (doc_id % $mSql) || '.example.org',
         'site0.example.org'
       FROM documents WHERE (doc_id % $mSql) % 5 = 0"""

  /** q115: host PageRank — 4 fixed power-iteration rounds in scaled
    * integer arithmetic (Graph.pageRank scaladoc has the exact update
    * rule). The oracle unrolls the identical four rounds in SQL over
    * the closed-form edge set: residue arithmetic gives it DISTINCT
    * edges directly, `//` is the same floor division, and the inflow
    * sums are exact BIGINT sums — any deviation in dedup, out-degree,
    * dangling handling, the teleport term, or iteration count breaks
    * the hash. Scale shape: 4 Pregel supersteps, each one node-keyed
    * shuffle with map-side partial sums over |E| rows. */
  val q115_host_pagerank: Q = (s, d) =>
    Graph.pageRank(hostEdges(s, d), "src", "dst", iters = 4)

  private def prIterSql(k: Int): String =
    s"""r$k AS (SELECT nodes.v AS v,
         (((1000000000000 // (SELECT count(*) FROM nodes)) * 15) // 100)
           + ((85 * COALESCE(t.infl, 0)) // 100) AS r
       FROM nodes LEFT JOIN (
         SELECT e.dst AS v, CAST(SUM(r${k - 1}.r // od.od) AS BIGINT) AS infl
         FROM e JOIN od ON od.src = e.src
           JOIN r${k - 1} ON r${k - 1}.v = e.src
         GROUP BY e.dst) t ON nodes.v = t.v)"""

  val q115_oracle: String =
    s"""WITH inst AS ($edgeSql),
       e AS (SELECT DISTINCT src, dst FROM inst),
       nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
       r0 AS (SELECT v, 1000000000000 // (SELECT count(*) FROM nodes) AS r
              FROM nodes),
       ${prIterSql(1)},
       ${prIterSql(2)},
       ${prIterSql(3)},
       ${prIterSql(4)}
       SELECT v AS node, CAST(r AS BIGINT) AS pr FROM r4"""

  /** q116: per-host degree profile over the edge instances —
    * out/in-degree (instances), distinct neighbour counts, reciprocal
    * distinct edges (the link-spam signals). s=100's two links collapse
    * to one distinct neighbour and s=50's self-loop is its own
    * reciprocal, so the instance-vs-distinct and reciprocity semantics
    * are all load-bearing in the fixture. */
  val q116_degree_profile: Q = (s, d) =>
    Graph.degreeProfile(hostEdges(s, d), "src", "dst")

  val q116_oracle: String =
    s"""WITH e AS ($edgeSql),
       out_ AS (SELECT src AS node, count(*) AS out_deg,
                  count(DISTINCT dst) AS out_nbrs FROM e GROUP BY src),
       in_ AS (SELECT dst AS node, count(*) AS in_deg,
                 count(DISTINCT src) AS in_nbrs FROM e GROUP BY dst),
       de AS (SELECT DISTINCT src, dst FROM e),
       rc AS (SELECT f.src AS node, count(*) AS recip_edges
              FROM de f JOIN de r ON f.src = r.dst AND f.dst = r.src
              GROUP BY f.src)
       SELECT node,
         CAST(COALESCE(out_deg, 0) AS BIGINT) AS out_deg,
         CAST(COALESCE(out_nbrs, 0) AS BIGINT) AS out_nbrs,
         CAST(COALESCE(in_deg, 0) AS BIGINT) AS in_deg,
         CAST(COALESCE(in_nbrs, 0) AS BIGINT) AS in_nbrs,
         CAST(COALESCE(recip_edges, 0) AS BIGINT) AS recip_edges
       FROM out_ FULL OUTER JOIN in_ USING (node) LEFT JOIN rc USING (node)"""

  /** q125: TrustRank — personalized PageRank whose teleport is
    * restricted to a curated seed set (hosts with residue % 10 == 0,
    * 11 of the 101 hosts), the link-spam counterpart of q115: rank
    * mass enters ONLY at trusted seeds and decays along links, so a
    * host's score measures link-distance from trust, not raw
    * popularity. Non-seed hosts start at 0 (many stay there — that IS
    * the signal), and site0's mega-in-degree only pays off because
    * seeds link into its neighbourhood. The oracle unrolls the same
    * 4 seed-conditional rounds in SQL — seed-set intersection, the
    * conditional teleport, zero init for non-seeds, and floor division
    * are all load-bearing. Scale shape: pageRank's 4 node-keyed
    * supersteps plus one broadcast of the seed list. */
  val q125_trustrank: Q = (s, d) => {
    val seeds = withM(Tables.documents(s, d))
      .filter((col("doc_id") % col("__m")) % 10 === 0)
      .select(concat(lit("site"), col("doc_id") % col("__m"),
        lit(".example.org")).as("node"))
      .distinct()
    Graph.personalizedPageRank(hostEdges(s, d), "src", "dst",
      seeds, "node", iters = 4)
  }

  private def trIterSql(k: Int): String =
    s"""r$k AS (SELECT sn.v AS v,
         CASE WHEN sn.s THEN
           (((1000000000000 // (SELECT c FROM ns)) * 15) // 100)
         ELSE 0 END
           + ((85 * COALESCE(t.infl, 0)) // 100) AS r
       FROM sn LEFT JOIN (
         SELECT e.dst AS v, CAST(SUM(r${k - 1}.r // od.od) AS BIGINT) AS infl
         FROM e JOIN od ON od.src = e.src
           JOIN r${k - 1} ON r${k - 1}.v = e.src
         GROUP BY e.dst) t ON sn.v = t.v)"""

  val q125_oracle: String =
    s"""WITH inst AS ($edgeSql),
       e AS (SELECT DISTINCT src, dst FROM inst),
       nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       seeds AS (SELECT DISTINCT
           'site' || (doc_id % $mSql) || '.example.org' AS v
         FROM documents WHERE (doc_id % $mSql) % 10 = 0),
       sn AS (SELECT nodes.v AS v, (seeds.v IS NOT NULL) AS s
              FROM nodes LEFT JOIN seeds ON nodes.v = seeds.v),
       ns AS (SELECT count(*) AS c FROM sn WHERE s),
       od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
       r0 AS (SELECT v, CASE WHEN s THEN
                1000000000000 // (SELECT c FROM ns) ELSE 0 END AS r
              FROM sn),
       ${trIterSql(1)},
       ${trIterSql(2)},
       ${trIterSql(3)},
       ${trIterSql(4)}
       SELECT v AS node, CAST(r AS BIGINT) AS pr FROM r4"""

  /** Anchor page grammar (q120/q121): five anchors per doc covering the
    * extraction grammar — a MANGLED absolute target with nested markup
    * in the text, a relative target with an entity, two anchors to the
    * SAME x-target (different texts — splits n_refs from n_docs in the
    * aggregate), and an unclosed anchor (empty text) — plus an `<area>`
    * decoy. */
  private def anchorPages(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val page = concat(
      lit("<html><body><A HREF=\"HTTPS://HUB"), (id + 1) % 37,
      lit(".EXAMPLE.ORG:443/a"), id % 5, lit("\"><b>Bold</b> Anchor "), id,
      lit("</A><a href='/rel/p"), id, lit("'>plain &amp; text "), id % 5,
      lit("</a><area href=\"decoy\"><a href=\"https://x.example.org/u"),
      id % 3, lit("\">  spaced   words "), id,
      lit(" </a><a href='https://x.example.org/u"), id % 3,
      lit("'>again "), id % 7,
      lit("</a><a href=\"https://dangling.example.org/d"), id,
      lit("\">no close</body></html>"))
    Tables.documents(s, d)
      .select(id, posexplode(extractAnchors(page)).as(Seq("pos", "a")))
      .select(id, col("pos").cast("long").as("pos"),
        col("a.href").as("link"), col("a.text").as("anchor"))
  }

  /** q120: anchor extraction — (doc_id, pos, raw href, stripped anchor
    * text) in document order; the oracle writes all five expected rows
    * per doc in closed form (nested-markup strip, entity decode,
    * whitespace collapse, unclosed-anchor empty text, decoy rejection
    * all load-bearing). Per-row extract + posexplode: no shuffle. */
  val q120_extract_anchors: Q = (s, d) => anchorPages(s, d)

  val q120_oracle: String =
    """SELECT doc_id, CAST(0 AS BIGINT) AS pos,
         'HTTPS://HUB' || ((doc_id + 1) % 37) || '.EXAMPLE.ORG:443/a'
           || (doc_id % 5) AS link,
         'Bold Anchor ' || doc_id AS anchor FROM documents
       UNION ALL
       SELECT doc_id, CAST(1 AS BIGINT), '/rel/p' || doc_id,
         'plain & text ' || (doc_id % 5) FROM documents
       UNION ALL
       SELECT doc_id, CAST(2 AS BIGINT),
         'https://x.example.org/u' || (doc_id % 3),
         'spaced words ' || doc_id FROM documents
       UNION ALL
       SELECT doc_id, CAST(3 AS BIGINT),
         'https://x.example.org/u' || (doc_id % 3),
         'again ' || (doc_id % 7) FROM documents
       UNION ALL
       SELECT doc_id, CAST(4 AS BIGINT),
         'https://dangling.example.org/d' || doc_id, '' FROM documents"""

  /** q121: per-target anchor-text aggregate — the anchor-text index a
    * link-graph pipeline builds (anchor text describes the TARGET):
    * canonicalize each href, keep absolute https targets, and per
    * target count references, distinct referring docs, and the
    * lexicographically first anchor text. The duplicated x-target
    * splits n_refs (2·docs) from n_docs; the mangled hub href only
    * aggregates correctly through canonicalization. One partial-agg
    * shuffle keyed by target. */
  val q121_anchor_text_agg: Q = (s, d) =>
    anchorPages(s, d)
      .withColumn("link", canonicalizeUrl(col("link")))
      .filter(col("link").startsWith("https://"))
      .groupBy(col("link"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("anchor")).as("first_anchor"))

  val q121_oracle: String =
    """WITH a AS (
         SELECT doc_id, 'https://hub' || ((doc_id + 1) % 37)
             || '.example.org/a' || (doc_id % 5) AS link,
           'Bold Anchor ' || doc_id AS anchor FROM documents
         UNION ALL
         SELECT doc_id, 'https://x.example.org/u' || (doc_id % 3),
           'spaced words ' || doc_id FROM documents
         UNION ALL
         SELECT doc_id, 'https://x.example.org/u' || (doc_id % 3),
           'again ' || (doc_id % 7) FROM documents
         UNION ALL
         SELECT doc_id, 'https://dangling.example.org/d' || doc_id, ''
         FROM documents)
       SELECT link, CAST(count(*) AS BIGINT) AS n_refs,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         min(anchor) AS first_anchor
       FROM a GROUP BY link"""

  /** q144: incremental rank refresh (Graph.pageRankFrom) — resume
    * power iteration from a frozen snapshot: q115's 4-round vector
    * feeds ONE more superstep, and the result must equal 5 rounds
    * from scratch bit-for-bit (the oracle unrolls all five). This is
    * the nightly-refresh contract: snapshot + k supersteps ==
    * continuous k₀+k, so a pipeline can refresh ranks without a full
    * recompute and trust the numbers to be identical. */
  val q144_rank_refresh: Q = (s, d) => {
    // ONE edge extraction for both walks (r19): snapshot and refresh
    // ran the whole extractLinks → canonicalize → host-parse pipeline
    // independently; the checkpoint materializes it once and both
    // operators read the cached edge list (results identical — the
    // extraction is deterministic).
    val edges = hostEdges(s, d).localCheckpoint(false)
    val snapshot = Graph.pageRank(edges, "src", "dst", iters = 4)
    Graph.pageRankFrom(edges, "src", "dst",
      snapshot, "node", "pr", iters = 1)
  }

  val q144_oracle: String =
    s"""WITH inst AS ($edgeSql),
       e AS (SELECT DISTINCT src, dst FROM inst),
       nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
       r0 AS (SELECT v, 1000000000000 // (SELECT count(*) FROM nodes) AS r
              FROM nodes),
       ${prIterSql(1)},
       ${prIterSql(2)},
       ${prIterSql(3)},
       ${prIterSql(4)},
       ${prIterSql(5)}
       SELECT v AS node, CAST(r AS BIGINT) AS pr FROM r5"""

  /** q127: anchor-text relevance join — the anchor INDEX (q121's
    * per-target aggregate) joined back to the documents as a per-doc
    * quality feature, the way link-graph curation attaches "how is
    * this page described by others" signals (incoming refs, referring-
    * doc breadth, a canonical anchor text) before filtering. Each doc
    * owns the URL hub{doc_id%37}.example.org/a{doc_id%5}; referrers
    * are the docs with id ≡ doc_id−1 (mod 37) and id ≡ doc_id (mod 5),
    * so CRT gives every doc a non-trivial, varying in-ref count and
    * the left join's zero-fill is still exercised structurally. On top:
    * host_rank, the doc's row_number within its host by (in_refs DESC,
    * doc_id) — the "best-described page per site" cut a diversity-
    * aware sampler takes. Scale shape: one partial-agg shuffle builds
    * the index, one url-keyed equi-join (both sides corpus-scale, AQE
    * handles skew), one host-partitioned window — no driver-side
    * anything. */
  val q127_anchor_relevance: Q = (s, d) => {
    val idx = anchorPages(s, d)
      .withColumn("link", canonicalizeUrl(col("link")))
      .filter(col("link").startsWith("https://"))
      .groupBy(col("link"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("anchor")).as("first_anchor"))
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(lit("https://hub"), col("doc_id") % 37,
        lit(".example.org/a"), col("doc_id") % 5).as("url"),
      concat(lit("hub"), col("doc_id") % 37,
        lit(".example.org")).as("host"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("in_refs").desc, col("doc_id"))
    docs.join(idx, docs("url") === idx("link"), "left")
      .select(col("doc_id"), col("url"), col("host"),
        coalesce(col("n_refs"), lit(0L)).as("in_refs"),
        coalesce(col("n_docs"), lit(0L)).as("in_docs"),
        coalesce(col("first_anchor"), lit("")).as("top_anchor"))
      .withColumn("host_rank", row_number().over(w).cast("long"))
      .drop("host")
  }

  val q127_oracle: String =
    """WITH a AS (
         SELECT doc_id, 'https://hub' || ((doc_id + 1) % 37)
             || '.example.org/a' || (doc_id % 5) AS link,
           'Bold Anchor ' || doc_id AS anchor FROM documents
         UNION ALL
         SELECT doc_id, 'https://x.example.org/u' || (doc_id % 3),
           'spaced words ' || doc_id FROM documents
         UNION ALL
         SELECT doc_id, 'https://x.example.org/u' || (doc_id % 3),
           'again ' || (doc_id % 7) FROM documents
         UNION ALL
         SELECT doc_id, 'https://dangling.example.org/d' || doc_id, ''
         FROM documents),
       idx AS (SELECT link, count(*) AS n_refs,
           count(DISTINCT doc_id) AS n_docs, min(anchor) AS top
         FROM a GROUP BY link),
       d AS (SELECT doc_id,
           'https://hub' || (doc_id % 37) || '.example.org/a'
             || (doc_id % 5) AS url,
           'hub' || (doc_id % 37) || '.example.org' AS host
         FROM documents)
       SELECT d.doc_id, d.url,
         CAST(COALESCE(idx.n_refs, 0) AS BIGINT) AS in_refs,
         CAST(COALESCE(idx.n_docs, 0) AS BIGINT) AS in_docs,
         COALESCE(idx.top, '') AS top_anchor,
         CAST(row_number() OVER (PARTITION BY d.host
           ORDER BY COALESCE(idx.n_refs, 0) DESC, d.doc_id)
           AS BIGINT) AS host_rank
       FROM d LEFT JOIN idx ON d.url = idx.link"""

  /** q152: HITS hubs & authorities ([[Graph.hits]]) — the third rank
    * signal of the graph family: PageRank scores global prestige,
    * TrustRank scores seed proximity, HITS splits DIRECTORIES (hubs:
    * the s%5==0 sources fanning into site0) from DESTINATIONS
    * (authorities: site0 and the residue-cycle confluences). Two
    * rounds of the L1-normalized integer update (Kleinberg's L2 norm
    * needs a sqrt no integer oracle can replay; the L1 variant keeps
    * the fixpoint structure in exact floor division). The oracle
    * unrolls both rounds — four half-steps, each an edge join + sum +
    * scalar-subquery normalization — over the closed-form edge set. */
  val q152_hits: Q = (s, d) =>
    Graph.hits(hostEdges(s, d), "src", "dst", iters = 2)

  private def hitsHalfSql(outName: String, rawName: String,
      joinKey: String, groupKey: String, prev: String,
      prevVal: String): String =
    s"""$rawName AS (SELECT e.$groupKey AS v,
         CAST(SUM($prev.$prevVal) AS BIGINT) AS rw
       FROM e JOIN $prev ON $prev.v = e.$joinKey GROUP BY e.$groupKey),
       $outName AS (SELECT nodes.v,
         CASE WHEN (SELECT SUM(rw) FROM $rawName) > 0
              THEN (COALESCE(t.rw, 0) * 1000000)
                // (SELECT SUM(rw) FROM $rawName)
              ELSE 0 END AS x
       FROM nodes LEFT JOIN $rawName t ON t.v = nodes.v)"""

  val q152_oracle: String =
    s"""WITH inst AS ($edgeSql),
       e AS (SELECT DISTINCT src, dst FROM inst),
       nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
       h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS x FROM nodes),
       ${hitsHalfSql("a1", "a1r", "src", "dst", "h0", "x")},
       ${hitsHalfSql("h1", "h1r", "dst", "src", "a1", "x")},
       ${hitsHalfSql("a2", "a2r", "src", "dst", "h1", "x")},
       ${hitsHalfSql("h2", "h2r", "dst", "src", "a2", "x")}
       SELECT h2.v AS node, CAST(h2.x AS BIGINT) AS hub,
         CAST(a2.x AS BIGINT) AS auth
       FROM h2 JOIN a2 ON a2.v = h2.v"""

  /** q156: deterministic label propagation
    * ([[Graph.labelPropagation]]) — community detection over the
    * symmetrized host graph: two synchronous rounds of modal-neighbor
    * label adoption (ties to the lowest label), the published
    * random/async algorithm pinned down to a pure function of the
    * edge set. The oracle replays both rounds with the identical
    * ballot-count + (count DESC, label) rank. */
  val q156_label_propagation: Q = (s, d) =>
    Graph.labelPropagation(hostEdges(s, d), "src", "dst", iters = 2)

  private def lpaIterSql(k: Int): String =
    s"""c$k AS (SELECT ue.a AS v, l${k - 1}.l AS l, count(*) AS c
         FROM ue JOIN l${k - 1} ON l${k - 1}.v = ue.b GROUP BY 1, 2),
       l$k AS (SELECT v, l FROM (SELECT v, l,
           row_number() OVER (PARTITION BY v
             ORDER BY c DESC, l) AS rn FROM c$k) WHERE rn = 1)"""

  val q156_oracle: String =
    s"""WITH inst AS ($edgeSql),
       de AS (SELECT DISTINCT src, dst FROM inst),
       ue AS (SELECT src AS a, dst AS b FROM de
              UNION SELECT dst, src FROM de),
       l0 AS (SELECT DISTINCT a AS v, a AS l FROM ue),
       ${lpaIterSql(1)},
       ${lpaIterSql(2)}
       SELECT v AS node, l AS label FROM l2"""

  /** q238: triangle counts + local clustering coefficients over the
    * undirected host graph ([[graft.operators.Graph.triangles]] —
    * degree-oriented wedge join, the forward algorithm): the
    * community-structure signal degreeProfile's pairwise reciprocity
    * cannot see. The fixture's residue graph carries 45 genuine
    * triangles at sf0.001 (site0's hub edges close against the 3s+1 /
    * 7s+5 cycle chords), with degrees 2..40+, so lcc spreads across
    * (0, 1). tri/deg gate as exact integers; lcc is ONE IEEE division
    * of two exact integers (NULL below deg 2); the oracle counts the
    * same triples by lexicographic closure — orientation-invariant,
    * so the two methods must agree exactly. */
  val q238_host_triangles: Q = (s, d) =>
    Graph.triangles(hostEdges(s, d), "src", "dst")

  val q238_oracle: String =
    s"""WITH inst AS ($edgeSql),
       und AS (SELECT DISTINCT least(src, dst) AS a,
           greatest(src, dst) AS b
         FROM inst
         WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
           SELECT a AS v FROM und UNION ALL SELECT b FROM und)
         GROUP BY v),
       t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM und e1 JOIN und e2 ON e2.a = e1.b
         JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       pn AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM (
           SELECT x AS v FROM t UNION ALL SELECT y FROM t
           UNION ALL SELECT z FROM t) GROUP BY v)
       SELECT deg.v AS node, deg.deg,
         CAST(coalesce(pn.tri, 0) AS BIGINT) AS tri,
         CASE WHEN deg.deg >= 2 THEN
           CAST(2 * coalesce(pn.tri, 0) AS DOUBLE)
             / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) END AS lcc
       FROM deg LEFT JOIN pn ON pn.v = deg.v"""

  /** q239: crawl depth — BFS distance of every host from the seed
    * whitelist (site0, the fixture's hub) over the directed host
    * graph, capped at 4 hops ([[graft.operators.Graph.bfsDepth]] —
    * the raw distance signal TrustRank integrates; frontier
    * scheduling reads it directly). The residue graph's frontier
    * grows 1/2/4/7/13 across the levels at sf0.001, so every
    * relaxation round changes the answer; unreached hosts are ABSENT
    * (unknown ≠ infinite). Exact integers; the oracle unrolls the
    * identical Bellman-Ford recurrence. */
  val q239_crawl_depth: Q = (s, d) =>
    Graph.bfsDepth(hostEdges(s, d), "src", "dst",
      Seq("site0.example.org"), maxDepth = 4)

  private def bfsIterSql(k: Int): String =
    s"""d$k AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         SELECT node, dist FROM d${k - 1}
         UNION ALL
         SELECT e.dst, d${k - 1}.dist + 1 FROM e
         JOIN d${k - 1} ON d${k - 1}.node = e.src) GROUP BY node)"""

  val q239_oracle: String =
    s"""WITH inst AS ($edgeSql),
       e AS (SELECT DISTINCT src, dst FROM inst
         WHERE src IS NOT NULL AND dst IS NOT NULL),
       d0 AS (SELECT 'site0.example.org' AS node, CAST(0 AS BIGINT)
           AS dist),
       ${bfsIterSql(1)},
       ${bfsIterSql(2)},
       ${bfsIterSql(3)},
       ${bfsIterSql(4)}
       SELECT node, dist FROM d4"""

  /** q241: butterfly counts on the BIPARTITE doc→host link graph
    * ([[graft.operators.Graph.butterflies]] — Sanei-Mehri et al.'s
    * 2×2-biclique census, KDD 2018): hosts repeatedly co-cited by the
    * SAME documents (boilerplate link blocks, mirror farms) light up
    * here while plain degree profiles see nothing. The fixture's
    * residue classes make every same-residue doc emit an identical
    * host pair, so shared-pair counts are ~docs/101 and butterfly
    * counts reach C(n,2) ≈ thousands — all exact integers. Wedges
    * enumerate on the DOC side (outlinks bounded by the page, the
    * published low-degree-side trick), so no host's popularity can
    * explode the join. */
  val q241_host_butterflies: Q = (s, d) => {
    val id = col("doc_id")
    val m = col("__m")
    val page = concat(
      lit("<html><body><p>t</p><A HREF=\"HTTPS://SITE"), (id * 3 + 1) % m,
      lit(".EXAMPLE.ORG:443/p"), id, lit("?utm_source=x\">a</A>"),
      lit("<a href='https://site"), (id * 7 + 5) % m,
      lit(".example.org/q"), id, lit("'>b</a>"),
      when((id % m) % 5 === 0,
        concat(lit("<a href=\"https://site0.example.org/h"), id,
          lit("\">c</a>"))).otherwise(lit("")),
      lit("</body></html>"))
    val edges = withM(Tables.documents(s, d))
      .select(id, m, explode(extractLinks(page)).as("raw"))
      .select(col("doc_id"),
        parse_url(canonicalizeUrl(col("raw")), lit("HOST")).as("host"))
    Graph.butterflies(edges, "doc_id", "host")
      .select(col("node").as("host"), col("n_left").as("n_docs"),
        col("butterflies"))
  }

  val q241_oracle: String =
    s"""WITH e AS (
         SELECT DISTINCT doc_id AS d,
           'site' || ((3 * (doc_id % $mSql) + 1) % $mSql)
             || '.example.org' AS h
         FROM documents
         UNION
         SELECT doc_id,
           'site' || ((7 * (doc_id % $mSql) + 5) % $mSql)
             || '.example.org'
         FROM documents
         UNION
         SELECT doc_id, 'site0.example.org'
         FROM documents WHERE (doc_id % $mSql) % 5 = 0),
       deg AS (SELECT h AS node, CAST(count(*) AS BIGINT) AS n_docs
         FROM e GROUP BY 1),
       p AS (SELECT x.h AS h1, y.h AS h2, count(*) AS n
         FROM e x JOIN e y ON x.d = y.d AND x.h < y.h GROUP BY 1, 2),
       bf AS (SELECT h1, h2, CAST(n * (n - 1) // 2 AS BIGINT) AS bf
         FROM p WHERE n >= 2),
       pn AS (SELECT node, CAST(sum(bf) AS BIGINT) AS butterflies
         FROM (SELECT h1 AS node, bf FROM bf
               UNION ALL SELECT h2, bf FROM bf) GROUP BY 1)
       SELECT deg.node AS host, deg.n_docs,
         CAST(coalesce(pn.butterflies, 0) AS BIGINT) AS butterflies
       FROM deg LEFT JOIN pn ON pn.node = deg.node"""

  val all: Map[String, Q] = Map(
    "q241_host_butterflies" -> q241_host_butterflies,
    "q239_crawl_depth" -> q239_crawl_depth,
    "q238_host_triangles" -> q238_host_triangles,
    "q156_label_propagation" -> q156_label_propagation,
    "q152_hits" -> q152_hits,
    "q115_host_pagerank" -> q115_host_pagerank,
    "q116_degree_profile" -> q116_degree_profile,
    "q120_extract_anchors" -> q120_extract_anchors,
    "q121_anchor_text_agg" -> q121_anchor_text_agg,
    "q125_trustrank" -> q125_trustrank,
    "q127_anchor_relevance" -> q127_anchor_relevance,
    "q144_rank_refresh" -> q144_rank_refresh)

  val oracles: Map[String, String] = Map(
    "q241_host_butterflies" -> q241_oracle,
    "q239_crawl_depth" -> q239_oracle,
    "q238_host_triangles" -> q238_oracle,
    "q156_label_propagation" -> q156_oracle,
    "q152_hits" -> q152_oracle,
    "q115_host_pagerank" -> q115_oracle,
    "q116_degree_profile" -> q116_oracle,
    "q120_extract_anchors" -> q120_oracle,
    "q121_anchor_text_agg" -> q121_oracle,
    "q125_trustrank" -> q125_oracle,
    "q127_anchor_relevance" -> q127_oracle,
    "q144_rank_refresh" -> q144_oracle)
}
