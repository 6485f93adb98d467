package graft

/** Smoke: every SparkEntry query executes and the flagship entry returns
  * rows at sf0.001 (the driver's t1 gate). Exact-value correctness lives
  * in the Verify + DuckDB oracle path (tools/check.py), not here.
  */
class QueriesSmokeSpec extends SparkSuite {

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }
}
