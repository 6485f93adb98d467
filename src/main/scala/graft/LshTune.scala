package graft

import org.apache.spark.sql.SparkSession

/** ANN tuning harness: recall@20 of equal-rows-scanned-budget configs
  * for the two budgeted index families, against brute-force cosine.
  *
  * All LSH configs below hold L·p/2^b = 0.25 (a quarter of the corpus
  * scanned per query); all IVF configs hold nProbes/nLists = 0.25.
  * Measured at sf0.01 (near-isotropic synthetic embeddings, LSH's
  * hardest case), r08: single-table 1×(64 of 256) = 0.425; the
  * OR-construction at the same budget climbs with table count and
  * plane granularity, peaking at 64×(16 of 2^12) = 0.775 (32×(8 of
  * 2^10) = 0.706, 64×(8 of 2^11) = 0.7625). Those numbers picked
  * q40's config; QUALITY.json re-measures it per round. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val k = 20
    val queryIds = 0L until 8L
    val brute = queryIds.map { qid =>
      qid -> operators.Similarity.topKForId(emb, "embedding", "vec_id",
        qid, k).collect().map(_.getAs[Long]("vec_id")).toSet
    }.toMap
    // SPARK_GRAFT_SWEEP selects the family: lsh | ivf | all (default)
    val sweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "all")
    // (numTables, numPlanes, probesPerTable) — all at L*p/2^b = 0.25
    val configs = Seq((1, 8, 64), (32, 10, 8), (64, 10, 4), (16, 10, 16),
      (32, 11, 16), (64, 11, 8), (32, 12, 32), (64, 12, 16))
    for ((l, b, p) <- configs if sweep != "ivf") {
      var scanned = 0L
      val recalls = queryIds.map { qid =>
        // one candidate build per (config, query): count it for the
        // scanned-fraction budget, then rerank the SAME frame
        val (cands, qv) = operators.Similarity.lshTableCandidates(emb,
          "embedding", "vec_id", qid, l, b, 64, p)
        val c = cands.cache()
        scanned += c.count()
        val ids = operators.Similarity
          .lshRerank(c, qv, "embedding", "vec_id", k)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        c.unpersist()
        (ids & brute(qid)).size.toDouble / k
      }
      val mean = recalls.sum / recalls.size
      val frac = scanned.toDouble / (n * queryIds.size)
      println(f"L=$l%2d planes=$b probes/t=$p%2d  budget=${
        l * p / math.pow(2, b)}%.3f  scanned=$frac%.3f  " +
        f"recall@20=$mean%.4f  " +
        recalls.map(r => f"$r%.2f").mkString(" "))
    }
    // IVF at the same fraction-of-corpus budget: nProbes/nLists = 0.25
    val ivfConfigs = Seq((8, 2), (16, 4), (32, 8), (64, 16))
    for ((lists, probes) <- ivfConfigs if sweep != "lsh") {
      val recalls = queryIds.map { qid =>
        val ids = operators.Similarity.ivfTopKForId(emb, "embedding",
          "vec_id", qid, k, nLists = lists, nProbes = probes)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (ids & brute(qid)).size.toDouble / k
      }
      val mean = recalls.sum / recalls.size
      println(f"IVF lists=$lists%2d probes=$probes%2d  budget=${
        probes.toDouble / lists}%.3f  recall@20=$mean%.4f  " +
        recalls.map(r => f"$r%.2f").mkString(" "))
    }
    spark.stop()
  }
}
