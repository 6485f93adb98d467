package graft

/** Smoke: every SparkEntry query executes and the flagship entry returns
  * rows at sf0.001 (the driver's t1 gate). Exact-value correctness lives
  * in the Verify + DuckDB oracle path (tools/check.py), not here.
  */
class QueriesSmokeSpec extends SparkSuite {

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001 — WITH whole-stage " +
      "codegen fallback DISABLED, so a generated method passing " +
      "janino's 64 KB limit fails the suite instead of silently " +
      "running interpreted (ADVICE r11: q154's inlined sign sums did " +
      "exactly that, and only a bench-tail stack trace betrayed it)") {
    // restore whatever value the suite had, not a hardcoded "true"
    // (ADVICE r12: a hardcoded restore would mask a future
    // suite-level override of this conf)
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("q45's HLL estimates land within a 5% band of its exact twin's " +
      "counts — the sketch tolerance as an asserted CONTRACT (q45 is " +
      "rows-only in the gate; this pins its quality, QualityProbe " +
      "records it per round)") {
    import org.apache.spark.sql.functions.col
    val rows = queries.EventQueries.q45_approx_distinct(spark, sfDir)
      .select(col("event_type"), col("exact_users"), col("approx_users"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      val err = math.abs(approx - exact) / math.max(1.0, exact)
      assert(err <= 0.05,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact " +
          s"$exact (rel err ${"%.3f".format(err)} > 0.05)")
    }
  }
}
