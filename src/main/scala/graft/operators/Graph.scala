package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics over edge lists — the web-curation graph family
  * that sits downstream of outlink extraction
  * ([[graft.functions.TextFunctions.extractLinks]] → canonicalizeUrl →
  * host parse). Curation pipelines use these as document-level quality
  * signals: host PageRank is a classic crawl-frontier / quality prior
  * (Page et al. 1999, the original PageRank report), and degree
  * profiles (in/out-degree, reciprocity) feed link-spam heuristics.
  *
  * Everything here is DETERMINISTIC and engine-portable by
  * construction: PageRank runs in scaled-LONG integer arithmetic
  * (exact commutative sums — no float accumulation-order wobble), so a
  * SQL oracle can recompute the fixpoint bit-exactly with unrolled
  * iterations. No reference analogue (hematite has no graph surface).
  */
object Graph {

  /** Superstep lineage cut EVERY `CpEvery` ROUNDS, not every round
    * (r18): a per-round localCheckpoint is an eager job + a
    * serialization of the whole frontier, and at gate iteration
    * counts (2-8) those barriers dominated the iterative family
    * (pageRank 4-iter measured 2x faster without them — every round
    * is already a shuffle boundary, so fault recovery replays shuffle
    * files, not the scan). Deep walks still cut lineage every 8
    * supersteps so plan depth stays bounded; the LAST round is always
    * left lazy so callers (and the plan gate) see a real superstep
    * plan. Results are identical either way - a checkpoint is only a
    * materialization barrier. */
  private[operators] val CpEvery = 8
  private[operators] def cpCadence(df: DataFrame, round: Int,
      iters: Int): DataFrame =
    if (round != iters - 1 && (round + 1) % CpEvery == 0)
      df.localCheckpoint(false)
    else df


  /** PageRank with a FIXED iteration count in scaled integer
    * arithmetic. Ranks are longs in units of `scale⁻¹`: the classic
    * update r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u) becomes
    *
    *   b0 = scale div N                      (initial rank, all nodes)
    *   t  = (b0 · (dampDen − dampNum)) div dampDen      (teleport term)
    *   r' = t + (dampNum · Σ_{u→v} (r(u) div outdeg(u))) div dampDen
    *
    * with `div` = floor division on non-negative longs — identical in
    * Spark (`div`) and DuckDB (`//`), and Σ is a sum of longs (exact,
    * order-independent). Total mass stays ≤ scale by induction, so
    * dampNum·Σ ≤ dampNum·scale never overflows for the default
    * parameters (85·10¹² ≪ 2⁶³). Dangling nodes simply leak their mass
    * (the common "no redistribution" variant); self-loops are kept;
    * edges are deduplicated. A fixed `iters` (not convergence-tested)
    * keeps the operator a pure function of its input — the gate oracle
    * unrolls the same iterations in SQL.
    *
    * Scale shape: `iters` rounds of (edges ⋈ ranks on src) → hash-agg
    * on dst — every round is one shuffle keyed by node id with
    * map-side partial sums, exactly a Pregel superstep. The edge list
    * is planned once (localCheckpoint) with its out-degrees attached,
    * so the per-round work is one join + one aggregate over |E| rows;
    * lineage is cut every round. A mega-in-degree host (every page
    * links to site0) is a single hot reduce key whose partials
    * combine map-side — skew-safe, unlike a collect-and-loop driver
    * walk. Output is one row per node: (node, pr).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen not in [0,1]")
    require(scale > 0 && dampNum <= Long.MaxValue / scale,
      "dampNum * scale must not overflow a long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false) // reused every round + for the final left join
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val b0 = scale / n
    val t = b0 * (dampDen - dampNum) / dampDen
    // out-degrees ride WITH the edges: one join per round, not two
    val eo = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("od")), Seq("src"))
      .localCheckpoint(false)
    var r = nodes.select(col("node"), lit(b0).as("pr"))
    var i = 0
    while (i < iters) {
      val inflow = eo.join(r, eo("src") === r("node"))
        .select(eo("dst").as("node"), expr("pr div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("infl"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(t) + expr(s"($dampNum * coalesce(infl, 0L)) div $dampDen"))
            .as("pr"))
      // intermediate rounds cut lineage eagerly; the LAST stays lazy so
      // the caller sees (and the plan gate audits) a real superstep plan
      r = cpCadence(next, i, iters)
      i += 1
    }
    r
  }

  /** Resume power iteration from a FROZEN rank snapshot — the
    * incremental-refresh pattern: a pipeline that recomputes host
    * ranks nightly does not restart from uniform; it loads yesterday's
    * vector and runs one or two supersteps over the (possibly updated)
    * edge set. Same exact integer arithmetic and update rule as
    * [[pageRank]]; the initial vector comes from `init` (nodeCol,
    * prCol) instead of scale/N, nodes absent from the snapshot (new
    * hosts) start at 0 and earn rank through inflow plus their
    * teleport term from the CURRENT node count. Resuming k extra
    * rounds from a k₀-round snapshot over the SAME edges equals
    * running k₀+k rounds from scratch, bit-for-bit — the q144 gate
    * pins exactly that identity against an unrolled oracle.
    *
    * Scale shape: [[pageRank]]'s per-round superstep (edges ⋈ ranks →
    * dst-keyed partial-sum agg) plus one node-keyed join to seed the
    * loop from the snapshot. */
  def pageRankFrom(edges: DataFrame, srcCol: String, dstCol: String,
      init: DataFrame, nodeCol: String, prCol: String, iters: Int = 1,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen not in [0,1]")
    require(scale > 0 && dampNum <= Long.MaxValue / scale,
      "dampNum * scale must not overflow a long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "pageRankFrom on an empty graph")
    val t = (scale / n) * (dampDen - dampNum) / dampDen
    val eo = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("od")), Seq("src"))
      .localCheckpoint(false)
    var r = nodes
      .join(init.select(col(nodeCol).as("node"),
        col(prCol).cast("long").as("__pr0")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__pr0"), lit(0L)).as("pr"))
      .localCheckpoint(false)
    var i = 0
    while (i < iters) {
      val inflow = eo.join(r, eo("src") === r("node"))
        .select(eo("dst").as("node"), expr("pr div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("infl"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(t) + expr(s"($dampNum * coalesce(infl, 0L)) div $dampDen"))
            .as("pr"))
      r = cpCadence(next, i, iters)
      i += 1
    }
    r
  }

  /** Personalized PageRank with a seed-restricted teleport — TrustRank
    * (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam with
    * TrustRank", VLDB 2004): rank mass enters ONLY at a curated seed
    * set of trusted nodes and propagates along links, so spam hosts
    * far from any seed score ~0 even with huge in-degree. Same exact
    * scaled-LONG arithmetic as [[pageRank]] (floor division, order-
    * independent long sums, fixed iteration count), with the teleport
    * term conditional on seed membership:
    *
    *   bs = scale div |S∩V|                (initial rank, seeds only)
    *   tS = (bs · (dampDen − dampNum)) div dampDen   (seed teleport)
    *   r'(v) = [v∈S] · tS
    *         + (dampNum · Σ_{u→v} (r(u) div outdeg(u))) div dampDen
    *
    * Non-seed nodes start at 0 and earn rank only through inflow.
    * Total mass stays ≤ scale by the same induction, so the overflow
    * bound is unchanged. Seeds not present in the graph are ignored;
    * at least one seed must be a graph node.
    *
    * Scale shape: identical to [[pageRank]] — `iters` supersteps of
    * (edges ⋈ ranks on src) → dst-keyed hash-agg with map-side partial
    * sums — plus ONE broadcast join of the (small, curated) seed list
    * onto the node frame before the loop; the seed flag then rides the
    * checkpointed node frame, so the per-round plan is byte-identical
    * to unpersonalized PageRank's. Output: (node, pr), one row per
    * graph node (non-seed nodes far from any seed report pr = 0, which
    * IS the spam signal). */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String, iters: Int = 4,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen not in [0,1]")
    require(scale > 0 && dampNum <= Long.MaxValue / scale,
      "dampNum * scale must not overflow a long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val sd = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("__s", lit(true))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(sd), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__s"), lit(false)).as("is_seed"))
      .localCheckpoint(false) // reused every round: node set + seed flag
    val ns = nodes.filter(col("is_seed")).count()
    require(ns > 0, "personalizedPageRank needs >= 1 seed in the graph")
    val bs = scale / ns
    val tS = bs * (dampDen - dampNum) / dampDen
    val eo = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("od")), Seq("src"))
      .localCheckpoint(false)
    var r = nodes.select(col("node"),
      when(col("is_seed"), lit(bs)).otherwise(lit(0L)).as("pr"))
    var i = 0
    while (i < iters) {
      val inflow = eo.join(r, eo("src") === r("node"))
        .select(eo("dst").as("node"), expr("pr div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("infl"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(tS)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(infl, 0L)) div $dampDen"))
            .as("pr"))
      r = cpCadence(next, i, iters)
      i += 1
    }
    r
  }

  /** Per-node degree profile over an edge-INSTANCE list (multiplicity
    * preserved): out_deg / in_deg count link instances, out_nbrs /
    * in_nbrs count distinct neighbours, recip_edges counts distinct
    * out-edges whose reverse edge also exists (self-loops are their
    * own reverse). Nodes appearing only as a source (or only as a
    * target) still get a row, zero-filled on the missing side.
    *
    * Scale shape: two hash aggregates over the instance list (partial
    * map-side combine; the distinct-neighbour count shuffles (node,
    * nbr) pairs), one self-join of the DISTINCT edge set for
    * reciprocity, and an outer join on node to stitch the profile —
    * all key-partitioned, all linear in |E|. Nothing touches the
    * driver. */
  def degreeProfile(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val out = e.groupBy(col("src").as("node")).agg(
      count(lit(1)).as("out_deg"),
      countDistinct(col("dst")).as("out_nbrs"))
    val in = e.groupBy(col("dst").as("node")).agg(
      count(lit(1)).as("in_deg"),
      countDistinct(col("src")).as("in_nbrs"))
    val de = e.distinct()
    val recip = de.as("f").join(de.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      .groupBy(col("f.src").as("node"))
      .agg(count(lit(1)).as("recip_edges"))
    out.join(in, Seq("node"), "full_outer")
      .join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("out_nbrs"), lit(0L)).as("out_nbrs"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("in_nbrs"), lit(0L)).as("in_nbrs"),
        coalesce(col("recip_edges"), lit(0L)).as("recip_edges"))
  }

  /** Butterfly counts over a BIPARTITE edge list (left = documents,
    * right = hosts, say): a butterfly is the 2×2 biclique — two left
    * nodes sharing the same two right nodes — the bipartite analogue
    * of the triangle (Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018)
    * and the densest-coclick / template-farm signal: hosts whose
    * butterfly count dwarfs their degree are linked by the SAME set
    * of documents over and over (boilerplate link blocks, mirror
    * farms), where a plain degree profile sees nothing unusual.
    *
    * Counting: wedge on the LEFT side — for each left node, every
    * ordered pair of its right neighbours is a wedge; n wedges
    * landing on the same right pair close n·(n−1)/2 butterflies
    * (exact integer arithmetic; `DIV 2` of the even product). Per
    * right node: bf(h) = Σ over pairs containing h. Wedging on the
    * bounded-degree side is the published trick: documents carry a
    * bounded number of outlinks, so wedges per row are O(links²)
    * regardless of how popular any HOST is — a host with 10⁹
    * in-links generates no wedge explosion because wedges never
    * enumerate ITS neighbourhood.
    *
    * Output per right node: (node, n_left, butterflies) — distinct
    * left-degree and the number of butterflies through the node, both
    * exact integers, so the gate hash-matches.
    *
    * Scale shape: dedupe → one self-equi-join on the left key (the
    * wedge), one (h1, h2)-keyed count (map-side combined), one
    * explode(2) + sum. The deduped edge set localCheckpoints for its
    * three consumers. */
  def butterflies(edges: DataFrame, leftCol: String,
      rightCol: String): DataFrame = {
    val e = edges
      .filter(col(leftCol).isNotNull && col(rightCol).isNotNull)
      .select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("r").as("node"))
      .agg(count(lit(1)).as("n_left"))
    val pairs = e.as("x").join(e.as("y"),
        col("x.l") === col("y.l") && col("x.r") < col("y.r"))
      .groupBy(col("x.r").as("h1"), col("y.r").as("h2"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bf", expr("n * (n - 1) DIV 2"))
      .filter(col("bf") > 0)
    val perNode = pairs
      .select(explode(array(col("h1"), col("h2"))).as("node"),
        col("bf"))
      .groupBy(col("node")).agg(sum(col("bf")).as("butterflies"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("n_left"),
        coalesce(col("butterflies"), lit(0L)).as("butterflies"))
  }

  /** Bounded-depth BFS distances from a seed set over the DIRECTED
    * deduplicated edge list — "crawl depth": how many link hops a
    * host sits from the seed whitelist (the frontier-scheduling /
    * trust-decay signal TrustRank integrates; this is the raw
    * distance). dist(v) = min hops from any seed, computed by
    * `maxDepth` Bellman-Ford-style relaxation rounds:
    *
    *   d_k(v) = min(d_{k-1}(v), 1 + min_{u→v} d_{k-1}(u))
    *
    * which after k rounds equals the true BFS distance for every node
    * within k hops — a well-defined graph property, so the oracle may
    * unroll the same recurrence in SQL and must agree exactly. Nodes
    * beyond `maxDepth` are ABSENT (unknown ≠ infinite). Exact integer
    * arithmetic throughout.
    *
    * Scale shape: `maxDepth` Pregel supersteps — each one
    * (reached ⋈ edges) equi-join + a node-keyed min (map-side
    * combined), the [[pageRank]] shuffle; the reached set only grows
    * and stays node-bounded. Edges dedupe once and localCheckpoint
    * for the k join consumers. */
  def bfsDepth(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[String], maxDepth: Int): DataFrame = {
    require(seeds.nonEmpty, "bfsDepth needs at least one seed")
    require(maxDepth >= 1 && maxDepth <= 12,
      s"maxDepth $maxDepth out of [1, 12] (each level is a superstep)")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(false)
    var dist = seeds.distinct.toDF("node")
      .withColumn("dist", lit(0L))
    for (i <- 1 to maxDepth) {
      val next = dist.join(e, dist("node") === e("src"))
        .select(col("dst").as("node"), lit(i.toLong).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Triangle counts and local clustering coefficients over the
    * UNDIRECTED simple graph of an edge list (self-loops dropped,
    * direction and multiplicity collapsed) — the community-structure
    * signal of the family: a host whose neighbours link each other is
    * a topical cluster; one whose neighbours never do is a hub or a
    * spam farm (degreeProfile's reciprocity sees mutual PAIRS, this
    * sees closed TRIPLES).
    *
    * Algorithm: degree orientation + wedge join (Schank & Wagner's
    * forward algorithm, WEA 2005; the MapReduce form in Suri &
    * Vassilvitskii, WWW 2011): orient every undirected edge from its
    * (degree, id)-smaller endpoint to the larger, join oriented edges
    * on the source to enumerate each wedge once (pair ordered by the
    * SAME (degree, id) total order), close against the oriented edge
    * set. Every triangle is produced exactly once, and the wedge
    * count is Σ_v outdeg(v)² under degree orientation — O(E^1.5)
    * worst case and arboricity-bounded in practice, which is why this
    * is THE distributed triangle algorithm: a star host of degree 10⁶
    * contributes ZERO wedges (all its edges point inward).
    *
    * Output: (node, deg, tri, lcc) per node of the undirected graph —
    * deg = distinct-neighbour degree, tri = triangles through the
    * node, lcc = 2·tri / (deg·(deg−1)) as ONE IEEE division of exact
    * integers (NULL when deg < 2: undefined, not zero). Everything
    * else is integer counting, so the gate hash-matches.
    *
    * Scale shape: dedupe (map-side combined) → degree agg → two
    * |E|-keyed equi-joins (wedge + closure) → one explode(3) + count.
    * The deduped edge set localCheckpoints once for its four
    * consumers (degree, both wedge sides, closure). */
  def triangles(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient low -> high in the (deg, id) total order; a < b already,
    // so ties in degree keep (a -> b)
    val keepAb = col("da") < col("db") || col("da") === col("db")
    val o = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(keepAb, col("a")).otherwise(col("b")).as("u"),
        when(keepAb, col("b")).otherwise(col("a")).as("w"),
        when(keepAb, col("db")).otherwise(col("da")).as("dw"))
      .localCheckpoint(false)
    val wedgeOrder = col("e1.dw") < col("e2.dw") ||
      (col("e1.dw") === col("e2.dw") && col("e1.w") < col("e2.w"))
    val tris = o.as("e1").join(o.as("e2"),
        col("e1.u") === col("e2.u") && wedgeOrder)
      .select(col("e1.u").as("x"), col("e1.w").as("y"),
        col("e2.w").as("z"))
      .join(o.select(col("u").as("y"), col("w").as("z")), Seq("y", "z"))
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("lcc", when(col("deg") >= 2,
        (lit(2L) * col("tri")).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double")))
  }

  /** HITS hubs & authorities (Kleinberg, "Authoritative Sources in a
    * Hyperlinked Environment", JACM 46(5), 1999) with a FIXED
    * iteration count in exact integer arithmetic — the third rank
    * signal of the family ([[pageRank]] global prestige,
    * [[personalizedPageRank]] trust, HITS the hub/authority split
    * that separates directories from destinations). Kleinberg's L2
    * normalization needs a square root, which no integer gate can
    * replay — so this is the L1 variant (divide by the vector's SUM),
    * which keeps the same fixpoint structure and makes every step a
    * long sum plus a floor division:
    *
    *   a'(v) = Σ_{u→v} h(u);   a(v) = (a'(v)·scale) div Σ_w a'(w)
    *   h'(u) = Σ_{u→v} a(v);   h(u) = (h'(u)·scale) div Σ_w h'(w)
    *
    * per round, from h₀ = scale at every node, over DEDUPLICATED
    * edges. All values are non-negative so floor division is
    * identical in Spark `div`, DuckDB `//`, Java `/`. Overflow
    * contract: a'(v) ≤ maxInDegree·scale and the normalization
    * multiplies by scale again, so maxDegree·scale² must stay under
    * 2⁶³ — the default scale 10⁶ is safe to ~9×10⁶ max degree;
    * rank granularity is scale⁻¹.
    *
    * Scale shape: each half-round is one (edges ⋈ ranks) shuffle with
    * a node-keyed map-side partial sum — a Pregel superstep, exactly
    * [[pageRank]]'s — plus a ONE-ROW total broadcast for the
    * normalization (the bounded-build BNLJ shape the plan gate
    * permits). Output: (node, hub, auth) after `iters` rounds. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    def l1Normalized(raw: DataFrame, valCol: String,
        outCol: String): DataFrame = {
      val total = raw.agg(sum(col(valCol)).as("__S"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          when(col("__S") > 0,
            expr(s"(coalesce($valCol, 0L) * $scale) div __S"))
            .otherwise(lit(0L)).as(outCol))
    }
    var h = nodes.select(col("node"), lit(scale).as("hub"))
    var a: DataFrame = null
    var i = 0
    while (i < iters) {
      val araw = e.join(h, e("src") === h("node"))
        .groupBy(e("dst").as("node")).agg(sum(col("hub")).as("__ar"))
      a = l1Normalized(araw, "__ar", "auth")
      val hraw = e.join(a, e("dst") === a("node"))
        .groupBy(e("src").as("node")).agg(sum(col("auth")).as("__hr"))
      val hn = l1Normalized(hraw, "__hr", "hub")
      h = cpCadence(hn, i, iters)
      i += 1
    }
    h.join(a, Seq("node")).select(col("node"), col("hub"), col("auth"))
  }

  /** Synchronous label propagation (Raghavan, Albert, Kumara, "Near
    * linear time algorithm to detect community structures in
    * large-scale networks", Phys. Rev. E 76, 2007) made DETERMINISTIC:
    * the published algorithm breaks ballot ties randomly and updates
    * asynchronously; here every node simultaneously adopts the modal
    * label of its (symmetrized) neighbors with ties broken to the
    * LOWEST label, for a FIXED iteration count — a pure function of
    * the edge set that a SQL oracle replays round by round. Labels
    * start as the node's own id, so after k rounds a label names the
    * community's lexicographic anchor. Communities here are the
    * mutual-link clusters connected components can't separate (CC
    * merges everything touching; LPA needs a MAJORITY of neighbors).
    *
    * Scale shape: per round, one (edge ⋈ labels) shuffle + a
    * (node, label) hash agg + one node-keyed rank window — Pregel
    * supersteps like [[pageRank]]'s, with the ballot count combining
    * map-side. Output: (node, label) after `iters` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val ue = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(false)
    var l = ue.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var i = 0
    while (i < iters) {
      val ballots = ue.join(l, ue("b") === l("node"))
        .groupBy(ue("a").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("__c").desc, col("label"))
      val next = ballots.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).select(col("node"), col("label"))
      l = cpCadence(next, i, iters)
      i += 1
    }
    l
  }
}
