package graft

import org.apache.spark.sql.functions._

class TempDirsSpec extends SparkSuite {

  private def tmpRoot = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"))

  private def countDirs(prefix: String): Int = {
    val s = java.nio.file.Files.list(tmpRoot)
    try s.filter(p => p.getFileName.toString.startsWith(prefix)).count.toInt
    finally s.close()
  }

  test("scratch dirs are tracked and deleteAll reaps them recursively") {
    val before = countDirs("graft-tempdirs-spec-")
    val d = TempDirs.scratch("graft-tempdirs-spec-")
    val nested = java.nio.file.Paths.get(d, "a", "b")
    java.nio.file.Files.createDirectories(nested)
    java.nio.file.Files.writeString(nested.resolve("f.txt"), "x")
    assert(countDirs("graft-tempdirs-spec-") == before + 1)
    TempDirs.deleteAll()
    assert(countDirs("graft-tempdirs-spec-") == before,
      "deleteAll must remove the scratch dir and its contents")
    assert(TempDirs.pending == 0)
    TempDirs.deleteAll() // idempotent
  }

  test("index-lifecycle gate queries leave /tmp flat once reaped " +
      "(the r06 leak: repeated correctness+bench runs accumulated " +
      "gigabytes of graft-ivf-* dirs)") {
    TempDirs.deleteAll()
    val before = countDirs("graft-ivf-lifecycle-")
    val q = graft.queries.VectorQueries.all("q74_index_delete_probe")
    assert(q(spark, sfDir).count() > 0)
    // the lifecycle created its scratch dir — and REGISTERED it
    assert(countDirs("graft-ivf-lifecycle-") == before + 1)
    assert(TempDirs.pending >= 1)
    TempDirs.deleteAll()
    assert(countDirs("graft-ivf-lifecycle-") == before,
      "q74's index dir must be reaped, not leaked")
  }
}
