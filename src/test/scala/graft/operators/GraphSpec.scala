package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Scala reference of the exact integer-PageRank contract
    * (Graph.pageRank scaladoc) — same floor divisions, same long sums. */
  private def refPageRank(edges: Set[(Long, Long)], iters: Int,
      dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val n = nodes.size
    val b0 = scale / n
    val t = b0 * (dampDen - dampNum) / dampDen
    val od = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> b0).toMap
    for (_ <- 0 until iters) {
      val infl = edges.toSeq
        .map { case (u, v) => v -> r(u) / od(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v =>
        v -> (t + dampNum * infl.getOrElse(v, 0L) / dampDen)).toMap
    }
    r
  }

  // deterministic pseudo-random multigraph: cycles, confluences,
  // self-loops, dangling targets, duplicate instances
  private def mkEdges(n: Int, m: Int): Seq[(Long, Long)] =
    (0 until m).map { i =>
      val a = (i * 7919 + 13) % n
      val b = (a * a + i * 31 + 7) % (n + 5) // some targets never sources
      (a.toLong, b.toLong)
    }

  test("pageRank matches the scala reference bit-exactly on a messy " +
      "multigraph (self-loops, dangling nodes, duplicate edges)") {
    val inst = mkEdges(23, 200)
    val got = Graph.pageRank(inst.toDF("src", "dst"), "src", "dst",
        iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == refPageRank(inst.toSet, iters = 5))
  }

  test("pageRank is independent of input partitioning and edge " +
      "multiplicity, and mass stays bounded by scale") {
    val inst = mkEdges(17, 120)
    val base = Graph.pageRank(inst.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val rep = Graph.pageRank(
        (inst ++ inst).toDF("src", "dst").repartition(7), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(base == rep)
    assert(base.values.sum <= 1000000000000L)
    assert(base.values.forall(_ > 0))
  }

  test("pageRank concentrates rank on a hub every node links to") {
    val spokes = (1L to 10L).flatMap(i =>
      Seq((i, 0L), (i, i % 10 + 1))) // hub + ring
    val pr = Graph.pageRank(spokes.toDF("src", "dst"), "src", "dst", 8)
      .as[(Long, Long)].collect().toMap
    assert(pr(0L) > 3 * (1L to 10L).map(pr).max)
  }

  test("pageRankFrom: resuming k rounds from a k0-round snapshot " +
      "equals k0+k rounds from scratch, and unknown nodes start at 0") {
    val inst = mkEdges(19, 150)
    val full = Graph.pageRank(inst.toDF("src", "dst"), "src", "dst",
        iters = 6)
      .as[(Long, Long)].collect().toMap
    val snap = Graph.pageRank(inst.toDF("src", "dst"), "src", "dst",
      iters = 4)
    val resumed = Graph.pageRankFrom(inst.toDF("src", "dst"),
        "src", "dst", snap, "node", "pr", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(resumed == full) // bit-for-bit resume identity
    // a snapshot missing some nodes: they restart from 0 + teleport
    val partial = snap.filter($"node" < 5)
    val got = Graph.pageRankFrom(inst.toDF("src", "dst"),
        "src", "dst", partial, "node", "pr", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == full.keySet) // every node still ranked
    assert(got.values.forall(_ >= 0))
  }

  /** Scala reference of the seed-teleport contract
    * (Graph.personalizedPageRank scaladoc). */
  private def refTrustRank(edges: Set[(Long, Long)], seeds: Set[Long],
      iters: Int, dampNum: Long = 85, dampDen: Long = 100,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val s = seeds.intersect(nodes.toSet)
    val bs = scale / s.size
    val tS = bs * (dampDen - dampNum) / dampDen
    val od = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (s(v)) bs else 0L)).toMap
    for (_ <- 0 until iters) {
      val infl = edges.toSeq
        .map { case (u, v) => v -> r(u) / od(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v => v ->
        ((if (s(v)) tS else 0L) +
          dampNum * infl.getOrElse(v, 0L) / dampDen)).toMap
    }
    r
  }

  test("personalizedPageRank matches the scala reference bit-exactly, " +
      "ignoring seeds absent from the graph") {
    val inst = mkEdges(23, 200)
    val seeds = Set(0L, 5L, 11L, 999L) // 999 not a graph node
    val got = Graph.personalizedPageRank(inst.toDF("src", "dst"),
        "src", "dst", Seq(0L, 5L, 11L, 999L).toDF("node"), "node",
        iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == refTrustRank(inst.toSet, seeds, iters = 5))
    assert(got.values.sum <= 1000000000000L)
  }

  test("personalizedPageRank gives zero to nodes unreachable from any " +
      "seed and is partitioning/multiplicity independent") {
    // two components: seed-side chain 0->1->2, spam clique 10<->11
    val e = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 10L))
    val base = Graph.personalizedPageRank(e.toDF("src", "dst"),
        "src", "dst", Seq(0L).toDF("node"), "node", iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(base(0L) > 0 && base(1L) > 0 && base(2L) > 0)
    assert(base(10L) == 0 && base(11L) == 0) // no trust path -> 0
    val rep = Graph.personalizedPageRank(
        (e ++ e).toDF("src", "dst").repartition(5),
        "src", "dst", Seq(0L, 0L).toDF("node"), "node", iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(base == rep)
  }

  /** Scala reference of the exact L1-HITS contract (Graph.hits
    * scaladoc) — same long sums, same floor divisions. */
  private def refHits(edges: Set[(Long, Long)], iters: Int,
      scale: Long = 1000000L): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val s = raw.values.sum
      nodes.map(v => v -> (if (s > 0) raw.getOrElse(v, 0L) * scale / s
        else 0L)).toMap
    }
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 0 until iters) {
      a = norm(edges.toSeq.map { case (u, v) => v -> h(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
      h = norm(edges.toSeq.map { case (u, v) => u -> a(v) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("hits matches the scala reference bit-exactly; partitioning " +
      "and duplicate edges don't change it; mass stays l1-bounded") {
    val inst = mkEdges(19, 150)
    val got = Graph.hits(inst.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == refHits(inst.toSet, iters = 3))
    val rep = Graph.hits((inst ++ inst).toDF("src", "dst")
        .repartition(5), "src", "dst", 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep == got)
    assert(got.values.map(_._1).sum <= 1000000L)
    assert(got.values.map(_._2).sum <= 1000000L)
  }

  test("hits separates hubs from authorities on a directory graph") {
    // 0,1,2 each link to 10,11,12; nothing else
    val e = (for (s <- 0L to 2L; t <- 10L to 12L) yield (s, t))
    val got = Graph.hits(e.toDF("src", "dst"), "src", "dst", 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (s <- 0L to 2L) { assert(got(s)._1 > 0 && got(s)._2 == 0) }
    for (t <- 10L to 12L) { assert(got(t)._1 == 0 && got(t)._2 > 0) }
  }

  test("labelPropagation separates two cliques joined by one bridge " +
      "(CC would merge them) and is partitioning-invariant") {
    // cliques {0,1,2,3} and {10,11,12,13}, bridge 3-10
    val clique = (for {
      s <- Seq(0L, 1L, 2L, 3L); t <- Seq(0L, 1L, 2L, 3L) if s < t
    } yield (s, t)) ++ (for {
      s <- Seq(10L, 11L, 12L, 13L); t <- Seq(10L, 11L, 12L, 13L)
      if s < t
    } yield (s, t)) :+ (3L -> 10L)
    val got = Graph.labelPropagation(clique.toDF("src", "dst"),
        "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).map(got).toSet.size == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(got).toSet.size == 1)
    assert(got(0L) != got(11L),
      s"bridge merged the cliques: $got")
    val rep = Graph.labelPropagation(
        (clique ++ clique).toDF("src", "dst").repartition(5),
        "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rep == got)
  }

  test("degreeProfile counts instances vs distinct neighbours and " +
      "reciprocal edges, zero-filling one-sided nodes") {
    // 1->2 twice, 2->1 (reciprocal), 3->3 (self-loop = own reverse),
    // 1->4 (4 is sink), 5 absent entirely
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L), (1L, 4L))
    val p = Graph.degreeProfile(e.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(p(1L) == ((3L, 2L, 1L, 1L, 1L))) // out 3 inst/2 nbrs; recip 1->2
    assert(p(2L) == ((1L, 1L, 2L, 1L, 1L)))
    assert(p(3L) == ((1L, 1L, 1L, 1L, 1L))) // self-loop everywhere
    assert(p(4L) == ((0L, 0L, 1L, 1L, 0L))) // pure sink, zero-filled out
    assert(p.size == 4)
  }

  test("butterflies: K(2,2) and K(3,3) closed forms, a star has zero, " +
      "duplicate edges collapse, and a random bipartite graph matches " +
      "the brute-force pair census") {
    // K(2,2): 1 butterfly, both right nodes carry it
    val k22 = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (1L, "a"))
    val g22 = Graph.butterflies(k22.toDF("l", "r"), "l", "r")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(g22("a") == (("a", 2L, 1L)) && g22("b") == (("b", 2L, 1L)))
    // K(3,3): each right pair shares 3 docs -> C(3,2)=3 butterflies
    // per pair; each right node sits in 2 of the 3 pairs -> 6
    val k33 = for { l <- 1L to 3L; r <- Seq("a", "b", "c") } yield (l, r)
    val g33 = Graph.butterflies(k33.toDF("l", "r"), "l", "r")
      .as[(String, Long, Long)].collect()
    assert(g33.forall(x => x._2 == 3L && x._3 == 6L))
    // star (one doc, many hosts): wedges but no closure partner
    val star = (1 to 10).map(i => (1L, s"h$i"))
    assert(Graph.butterflies(star.toDF("l", "r"), "l", "r")
      .as[(String, Long, Long)].collect().forall(_._3 == 0L))
    // random bipartite vs brute force over right pairs
    val rng = new scala.util.Random(13)
    val rand = (0 until 150).map(_ =>
      (rng.nextInt(12).toLong, s"h${rng.nextInt(8)}"))
    val e = rand.distinct
    val hosts = e.map(_._2).distinct.sorted
    val docsOf = e.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val brute = hosts.map { h =>
      val bf = hosts.filter(_ != h).map { h2 =>
        val n = (docsOf(h) & docsOf(h2)).size.toLong
        n * (n - 1) / 2
      }.sum
      h -> ((docsOf(h).size.toLong, bf))
    }.toMap
    val got = Graph.butterflies(rand.toDF("l", "r"), "l", "r")
      .as[(String, Long, Long)].collect()
    assert(got.length == hosts.length)
    got.foreach { case (h, deg, bf) =>
      assert((deg, bf) == brute(h), s"host $h: ($deg, $bf) vs brute")
    }
    assert(got.map(_._3).sum > 0, "fixture should contain butterflies")
  }

  test("bfsDepth: exact hop distances on a known graph (min over " +
      "multiple paths, multi-seed min, depth cap leaves far nodes " +
      "ABSENT) and equals brute-force BFS on a random graph") {
    // chain 0->1->2->3->4->5 with shortcut 0->3: dist(3)=1, dist(4)=2
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 3L), (0L, 1L)) // dup edge collapses
    val d = Graph.bfsDepth(g.toDF("s", "d"), "s", "d", Seq("0"),
        maxDepth = 3)
      .as[(String, Long)].collect().toMap
    assert(d == Map("0" -> 0L, "1" -> 1L, "2" -> 2L, "3" -> 1L,
      "4" -> 2L, "5" -> 3L))
    // cap: depth 1 sees only the frontier; node 5 absent
    val d1 = Graph.bfsDepth(g.toDF("s", "d"), "s", "d", Seq("0"),
        maxDepth = 1).as[(String, Long)].collect().toMap
    assert(d1 == Map("0" -> 0L, "1" -> 1L, "3" -> 1L))
    // two seeds: min over both
    val d2 = Graph.bfsDepth(g.toDF("s", "d"), "s", "d",
        Seq("0", "4"), maxDepth = 2).as[(String, Long)].collect().toMap
    assert(d2("5") == 1L && d2("4") == 0L && d2("2") == 2L)
    // random directed graph vs brute-force BFS
    val rng = new scala.util.Random(11)
    val rand = (0 until 80).map(_ =>
      (rng.nextInt(15).toLong, rng.nextInt(15).toLong))
    val adj = rand.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var level = Set(0L)
    var seen = Map(0L -> 0L)
    for (i <- 1 to 4) {
      level = level.flatMap(v => adj.getOrElse(v, Nil))
        .filterNot(seen.contains)
      seen ++= level.map(_ -> i.toLong)
    }
    val got = Graph.bfsDepth(rand.toDF("s", "d"), "s", "d", Seq("0"),
        maxDepth = 4).as[(String, Long)].collect()
      .map { case (n, dd) => n.toLong -> dd }.toMap
    assert(got == seen, s"bfs mismatch: $got vs $seen")
  }

  test("triangles: equals a brute-force per-node count on a random " +
      "graph (direction/multiplicity/self-loops collapsed), K4 and a " +
      "star hit the closed forms, lcc NULL below degree 2") {
    // K4: every node deg 3, tri 3, lcc = 1; pendant node 9 off node 0:
    // deg 1, tri 0, lcc NULL. Direction + dup + self-loop noise added.
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b }
      yield (a.toLong, b.toLong)
    val noisy = k4 ++ Seq((2L, 1L), (3L, 3L), (0L, 9L), (0L, 9L))
    val p1 = Graph.triangles(noisy.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    (0L to 3L).foreach { v =>
      val (_, deg, tri, lcc) = p1(v)
      val expDeg = if (v == 0L) 4L else 3L
      assert(deg == expDeg && tri == 3L,
        s"K4 node $v: deg=$deg tri=$tri")
      if (v != 0L) assert(lcc.contains(1.0))
    }
    assert(p1(9L) == ((9L, 1L, 0L, None))) // pendant: undefined lcc
    // star: hub of degree 12, zero triangles anywhere
    val star = (1L to 12L).map(i => (0L, i))
    val hub = Graph.triangles(star.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(hub.forall(_._3 == 0L) &&
      hub.find(_._1 == 0L).get._4.contains(0.0))
    // random graph vs brute force over all unordered triples
    val rng = new scala.util.Random(7)
    val rand = (0 until 120).map(_ =>
      (rng.nextInt(18).toLong, rng.nextInt(18).toLong))
    val und = rand.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = (und.map(_._1) ++ und.map(_._2)).toSeq.sorted
    val brute = nodes.map { v =>
      val nbrs = und.collect { case (a, b) if a == v => b
                               case (a, b) if b == v => a }
      val tri = nbrs.toSeq.combinations(2).count { case Seq(x, y) =>
        und((math.min(x, y), math.max(x, y))) }
      v -> ((nbrs.size.toLong, tri.toLong))
    }.toMap
    val got = Graph.triangles(rand.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.length == nodes.length)
    got.foreach { case (v, deg, tri, lcc) =>
      assert((deg, tri) == brute(v), s"node $v: ($deg, $tri) vs brute")
      if (deg >= 2)
        assert(lcc.contains(2.0 * tri / (deg * (deg - 1.0))))
      else assert(lcc.isEmpty)
    }
    // the fixture genuinely has triangles (sum is 3x the count)
    assert(got.map(_._3).sum > 0 && got.map(_._3).sum % 3 == 0)
  }
}
