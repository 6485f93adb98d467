package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per suite (lazy, UTC, small shuffle). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", TempDirs.scratch("graft-wh-"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture dir: the driver-generated tables locally; CI points this at
    * graft.FixtureGen output (see .github/workflows/ci.yml). */
  def sfDir: String =
    sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")

  def tempDir(prefix: String): String = TempDirs.scratch(prefix)
}
