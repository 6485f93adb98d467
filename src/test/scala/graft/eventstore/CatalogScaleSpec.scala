package graft.eventstore

import graft.SparkSuite
import graft.functions.Base32
import java.nio.file.{Files, Paths}

/** Scale pin for the maintained stream catalog (r13 verdict item 5):
  * recovery over many streams must not be an O(streams) driver walk.
  * The pin is STRUCTURAL, not a stopwatch: the store counts directory
  * listings (the per-stream filesystem op) through its dirListCount
  * seam, and catalog-table recovery over 10^4 fabricated streams must
  * list O(1) directories where the reference-style walk lists every
  * one of them. A wall-clock assertion would flake on a loaded box;
  * the listing count is exact and deterministic.
  */
class CatalogScaleSpec extends SparkSuite {

  private val nStreams = 10000

  test(s"catalog-table recovery over $nStreams streams lists O(1) " +
      "directories; the walk lists all of them (the 10^6-stream boot " +
      "shape: one head-manifest read + a Spark fold, driver work " +
      "independent of stream count)") {
    val dir = tempDir("es-catscale-")
    // fabricate stream directories with minimal committed manifests —
    // the walk's input — without paying 10^4 parquet appends
    val userDir = Paths.get(dir, Base32.encodeString("u1"))
    (0 until nStreams).foreach { i =>
      val sDir = userDir.resolve(Base32.encodeString(s"s$i"))
      Files.createDirectories(sDir)
      Files.write(sDir.resolve("manifest-" + "0" * 19 + "1.log"),
        EventStore.serializeManifest(
          EventStore.Manifest(1L, 1L, Nil, Nil)).getBytes("UTF-8"))
    }
    // first recovery: no catalog yet -> the walk runs once and seeds
    val es1 = new EventStore(spark, dir)
    val before1 = es1.dirListCount.get()
    val walked = es1.recoverCatalog()
    assert(walked.size == nStreams)
    val walkListings = es1.dirListCount.get() - before1
    assert(walkListings >= nStreams,
      s"the seeding walk must visit every stream dir ($walkListings)")

    // restart: recovery takes the catalog-table path — one listing of
    // the catalog dir to find its head manifest, nothing per-stream
    val es2 = new EventStore(spark, dir)
    val before2 = es2.dirListCount.get()
    val recovered = es2.recoverCatalog()
    val tableListings = es2.dirListCount.get() - before2
    assert(recovered.size == nStreams)
    assert(recovered.toSet == walked.toSet)
    assert(tableListings <= 3,
      s"catalog-table recovery listed $tableListings directories — " +
        "it must be independent of the stream count")

    // and the audit path still agrees with the table
    assert(es2.walkCatalog().toSet == recovered.toSet)
  }
}
