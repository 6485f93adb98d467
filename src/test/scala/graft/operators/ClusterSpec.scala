package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Scala reference of the exact contract (Cluster.kmeansAssign
    * scaladoc): floor-quantize, argmin with (d2, cid) tiebreak,
    * truncating-division centroid update, empty cluster keeps its
    * previous centroid. */
  private def ref(vecs: Seq[(Long, Seq[Float])], k: Int, updates: Int,
      scale: Long = 10000L): Map[Long, (Int, Long)] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong).toArray
    }.toMap
    val ids = q.keys.toSeq.sorted
    var cents = ids.take(k).map(q(_).clone()).toArray
    def assign(c: Array[Array[Long]]): Map[Long, (Long, Int)] =
      ids.map { id =>
        id -> (0 until k).map { j =>
          (q(id).zip(c(j)).map { case (a, b) => (a - b) * (a - b) }.sum, j)
        }.min
      }.toMap
    for (_ <- 0 until updates) {
      val a = assign(cents)
      val next = cents.map(_.clone())
      a.groupBy(_._2._2).foreach { case (j, members) =>
        val vs = members.keys.toSeq.map(q)
        next(j) = vs.transpose.map(col => col.sum / vs.size).toArray
      }
      cents = next
    }
    assign(cents).map { case (id, (d2, j)) => id -> ((j, d2)) }
  }

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
    .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
    .collect().toSeq.sortBy(_._1).take(120)

  test("kmeansAssign matches the scala reference bit-exactly on real " +
      "embeddings (k=5, two Lloyd updates)") {
    val got = Cluster.kmeansAssign(emb.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5, updates = 2)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == ref(emb, k = 5, updates = 2))
    assert(got.values.map(_._1).toSet.size > 1) // actually clusters
  }

  test("assignment is independent of input partitioning, and updates=0 " +
      "is the pure seed assignment") {
    val base = Cluster.kmeansAssign(emb.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4, updates = 0)
      .as[(Long, Int, Long)].collect().toSet
    val rep = Cluster.kmeansAssign(
        emb.reverse.toDF("vec_id", "embedding").repartition(7),
        "vec_id", "embedding", k = 4, updates = 0)
      .as[(Long, Int, Long)].collect().toSet
    assert(base == rep)
    assert(base == ref(emb, k = 4, updates = 0).map {
      case (id, (j, d2)) => (id, j, d2)
    }.toSet)
    // seeds sit at distance 0 from their own centroid
    val seedIds = emb.map(_._1).sorted.take(4).toSet
    assert(base.filter(r => seedIds(r._1)).forall(_._3 == 0L))
  }

  test("degenerate corpora stay total and reference-exact: identical " +
      "points leave a cluster empty (it keeps its centroid, ties break " +
      "to the lowest id); duplicate seeds migrate-and-recapture") {
    // all-identical corpus: cluster 1 never gets a member, every tie -> 0
    val same = (1L to 5L).map(i => (i, Seq(0.25f, -0.5f)))
    val gotSame = Cluster.kmeansAssign(same.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, updates = 2)
      .as[(Long, Int, Long)].collect()
    assert(gotSame.forall(r => r._2 == 0 && r._3 == 0L), gotSame.toSeq)
    // duplicate seeds: round 1 empties cluster 1, then cluster 0's
    // centroid migrates toward the far mass and cluster 1 RECAPTURES
    // the origin points — the reference replays the same rounds
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)),
      (3L, Seq(1f, 1f)), (4L, Seq(0.1f, 0f)))
    val got = Cluster.kmeansAssign(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, updates = 2)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == ref(vecs, k = 2, updates = 2))
    assert(got(3L)._1 == 0 && got(1L)._1 == 1) // the recapture happened
  }

  // r18: nearestExpr moved from least(struct(aggregate(zip_with)))
  // — interpreted higher-order functions, k·d-literal plan bloat — to
  // the native NearestCentroidLong codegen kernel. Same contract:
  // exact long d2, ties to the lowest cluster id, ragged input refused.
  test("nearestExpr (native kernel) matches the interpreted " +
      "least(struct(aggregate(zip_with))) formulation, including ties") {
    def oldExpr(qvec: org.apache.spark.sql.Column,
        cents: Array[Array[Long]]): org.apache.spark.sql.Column =
      least(cents.zipWithIndex.map { case (c, j) =>
        struct(
          aggregate(
            zip_with(qvec, typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"),
          lit(j).as("cluster"))
      }.toIndexedSeq: _*)
    val cents = Array(
      Array(0L, 0L, 0L), Array(10L, -4L, 7L), Array(10L, -4L, 7L),
      Array(-3L, 2L, 1L))
    val rnd = new scala.util.Random(42)
    val vecs = (1L to 64L).map(i =>
      (i, Seq.fill(3)(rnd.nextLong(21) - 10))) :+
      (65L, Seq(10L, -4L, 7L)) // exact tie between centroids 1 and 2
    val df = vecs.toDF("id", "v")
    val both = df.select($"id",
        Cluster.nearestExpr($"v", cents).as("nw"),
        oldExpr($"v", cents).as("od"))
      .select($"id", $"nw.d2", $"nw.cluster", $"od.d2", $"od.cluster")
      .as[(Long, Long, Int, Long, Int)].collect()
    both.foreach { case (id, nd2, nc, od2, oc) =>
      assert(nd2 == od2 && nc == oc, s"id=$id: ($nd2,$nc) != ($od2,$oc)")
    }
    val tie = both.find(_._1 == 65L).get
    assert(tie._2 == 0L && tie._3 == 1) // lowest-id wins the tie
  }

  test("nearestExpr refuses ragged vectors loudly (stored-assignment " +
      "corruption guard, the MatVecLong discipline)") {
    val cents = Array(Array(0L, 0L, 0L))
    val e = intercept[Exception] {
      Seq((1L, Seq(1L, 2L))).toDF("id", "v")
        .select(Cluster.nearestExpr($"v", cents)).collect()
    }
    assert(e.getMessage != null)
  }

  test("nearestExpr refuses NULL ELEMENTS loudly (ADVICE r18: getLong " +
      "silently reads a null slot as 0 — same corruption class)") {
    val cents = Array(Array(0L, 0L, 0L))
    val e = intercept[Exception] {
      Seq((1L, Seq[java.lang.Long](1L, null, 3L))).toDF("id", "v")
        .select(Cluster.nearestExpr($"v", cents)).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("null element"))
        || mentions(t.getCause))
    assert(mentions(e))
  }
}
