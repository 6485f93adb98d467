package graft.eventstore

import graft.functions.Base32
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The event-store engine: an append-only, per-stream-ordered table of
  * CloudEvents with optimistic concurrency — the reference's storage
  * engine (src/db.rs) re-expressed on Spark primitives.
  *
  * Layout: one directory per stream, `root/<user>/<base32(stream)>/`
  * (mirroring reference src/server.rs:134-144), holding one parquet file
  * per committed batch named `batch-<firstRev>-<lastRev>-<uuid>.parquet`.
  * Batch atomicity = single-file atomic rename from a temp dir (the
  * analogue of the reference's single write+index append under the
  * stream mutex, src/db.rs:202-237). Readers never see a partial batch.
  *
  * Concurrency: single-writer-per-stream via JVM-local striped locks —
  * the same rule the reference enforces with `Arc<Mutex<Database>>`
  * (src/server.rs:58, 184). Different streams append in parallel. On a
  * multi-writer cluster this lock becomes a coordination service or a
  * transactional table format's conditional commit; the CAS check and
  * commit protocol below are unchanged by that swap.
  *
  * Scale: reads are DataFrame queries over the parquet layout — partition
  * pruning on the stream directory replaces the reference's u64 offset
  * index (src/db.rs:147-161); parquet row-group stats on `revision`
  * (sorted within every batch file) give the positional seek. The
  * revision counter is cached per stream and recovered from footer
  * metadata (file names), not by scanning data.
  */
class EventStore(val spark: SparkSession, rootDir: String) {
  import spark.implicits._

  private val root = Paths.get(rootDir)
  Files.createDirectories(root)

  /** per-stream revision cache + lock objects (stream key → revision). */
  private val revisions = new ConcurrentHashMap[String, java.lang.Long]()
  private val locks = new ConcurrentHashMap[String, Object]()

  private def key(u: String, s: String) = s"$u\u0000$s"
  private def lockFor(u: String, s: String): Object =
    locks.computeIfAbsent(key(u, s), _ => new Object)

  private def userPath(u: String): Path = root.resolve(Base32.encodeString(u))
  private def streamPath(u: String, s: String): Path =
    userPath(u).resolve(Base32.encodeString(s))

  /** Recover a stream's current revision from committed batch file names
    * (`batch-<first>-<last>-…`) — O(#files) metadata-only, the analogue
    * of revision-from-index-length (reference src/db.rs:103-113). */
  private def recoverRevision(u: String, s: String): Long = {
    val dir = streamPath(u, s)
    if (!Files.isDirectory(dir)) 0L
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case EventStore.BatchFile(_, last) => last.toLong + 1 }
      .maxOption.getOrElse(0L)
  }

  /** Current revision = number of committed events (0 = no stream). */
  def revision(u: String, s: String): Long =
    revisions.computeIfAbsent(key(u, s), _ => recoverRevision(u, s))

  def streamExists(u: String, s: String): Boolean =
    revision(u, s) > 0

  /** Append a batch with CAS + (source,id) dedup; returns the new
    * revision. Mirrors reference src/db.rs:180-240 step for step. */
  def append(u: String, s: String, events: Seq[CloudEvent],
      expected: ExpectedRevision = ExpectedRevision.Any): Long = {
    if (events.isEmpty) throw EmptyAppend // db.rs:185
    lockFor(u, s).synchronized {
      val current = revision(u, s)
      expected match { // db.rs:189-198
        case ExpectedRevision.Any =>
        case ExpectedRevision.NoStream =>
          if (current != 0) throw RevisionMismatch(expected, current)
        case ExpectedRevision.StreamExists =>
          if (current == 0) throw RevisionMismatch(expected, current)
        case ExpectedRevision.Exact(n) =>
          if (current != n) throw RevisionMismatch(expected, current)
      }
      // (source,id) uniqueness — the reference's O14 gap, closed:
      // intra-batch duplicates…
      events.groupBy(e => (e.source, e.id)).find(_._2.size > 1)
        .foreach { case ((src, id), _) => throw SourceIdConflict(src, id) }
      // …and batch-vs-committed via a left-semi join (scales: the batch
      // side is broadcast, the stream side is a pruned column scan).
      if (current > 0) {
        val existing = readStream(u, s).select($"source", $"id")
        val batchKeys = events.map(e => (e.source, e.id))
          .toDF("source", "id")
        val clash = existing.join(broadcast(batchKeys), Seq("source", "id"),
          "left_semi").limit(1).collect()
        clash.headOption.foreach(r =>
          throw SourceIdConflict(r.getString(0), r.getString(1)))
      }
      val now = new Timestamp(System.currentTimeMillis())
      val rows = events.zipWithIndex.map { case (e, i) =>
        StoredEvent(u, s, current + i, now, e.specversion, e.id, e.source,
          e.`type`, e.subject, e.time, e.datacontenttype, e.dataschema,
          e.data, e.data_base64, e.extensions)
      }
      commitBatch(u, s, rows, current, current + events.size - 1)
      val newRev = current + events.size // db.rs:239
      revisions.put(key(u, s), newRev)
      newRev
    }
  }

  /** Idempotent append for at-least-once delivery (streaming retries):
    * events whose (source,id) are already committed are silently dropped
    * instead of raising SourceIdConflict, so re-delivering a micro-batch
    * converges to exactly-once. Returns the stream revision after the
    * (possibly empty) effective append. Intra-batch duplicates are still
    * an error — retries re-deliver whole batches, they don't duplicate
    * within one. */
  def appendIdempotent(u: String, s: String, events: Seq[CloudEvent])
      : Long =
    lockFor(u, s).synchronized {
      if (events.isEmpty) return revision(u, s)
      events.groupBy(e => (e.source, e.id)).find(_._2.size > 1)
        .foreach { case ((src, id), _) => throw SourceIdConflict(src, id) }
      val fresh =
        if (revision(u, s) == 0) events
        else {
          val committed = readStream(u, s).select($"source", $"id")
            .join(broadcast(events.map(e => (e.source, e.id))
              .toDF("source", "id")), Seq("source", "id"), "left_semi")
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
          events.filterNot(e => committed.contains((e.source, e.id)))
        }
      if (fresh.isEmpty) revision(u, s)
      else append(u, s, fresh, ExpectedRevision.Any)
    }

  /** Write the batch to a temp dir, then atomically move the single part
    * file into the stream dir (all-or-nothing visibility). */
  private def commitBatch(u: String, s: String, rows: Seq[StoredEvent],
      first: Long, last: Long): Unit = {
    val dir = streamPath(u, s)
    Files.createDirectories(dir)
    val tmp = Files.createTempDirectory(root, ".commit-")
    try {
      spark.createDataset(rows).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.resolve("out").toString)
      val part = Files.list(tmp.resolve("out")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("no part file written"))
      val target = dir.resolve(
        s"batch-$first-$last-${java.util.UUID.randomUUID()}.parquet")
      Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  /** One stream as a Dataset (empty if absent). */
  def readStream(u: String, s: String): Dataset[StoredEvent] = {
    val dir = streamPath(u, s)
    if (!Files.isDirectory(dir) ||
        !Files.list(dir).iterator().asScala.exists(
          _.getFileName.toString.endsWith(".parquet")))
      spark.emptyDataset[StoredEvent]
    else spark.read.parquet(dir.toString).as[StoredEvent]
  }

  /** Positional range scan `[start, start+limit)` — reference
    * src/db.rs:133-177. Revision-range predicate + sort + limit; parquet
    * min/max stats on revision prune non-matching batch files. */
  def query(u: String, s: String, start: Long, limit: Int)
      : Seq[CloudEvent] =
    readStream(u, s)
      .filter($"revision" >= start && $"revision" < start + limit)
      .orderBy($"revision")
      .collect().toSeq.map(EventStore.toCloudEvent)

  /** Point lookup by rownum — reference src/server.rs:155-166. */
  def get(u: String, s: String, rownum: Long): Option[CloudEvent] =
    query(u, s, rownum, 1).headOption

  /** Paginated read with the reference's API clamps (offset ≥ 0, limit
    * ≤ 1000 default 50 — src/api.rs:271-272). */
  def page(u: String, s: String, offset: Long = 0, limit: Int = 50)
      : Seq[CloudEvent] =
    query(u, s, math.max(0, offset), math.min(math.max(limit, 0), 1000))

  /** All of a user's streams as one DataFrame (catalog scan). */
  def userEvents(u: String): DataFrame = {
    val dir = userPath(u)
    val streamDirs =
      if (!Files.isDirectory(dir)) Nil
      else Files.list(dir).iterator().asScala.filter(Files.isDirectory(_))
        .map(_.toString).toList
    if (streamDirs.isEmpty) spark.emptyDataset[StoredEvent].toDF
    else spark.read.parquet(streamDirs: _*)
  }

  /** Stream metadata listing — metadata-ONLY, exactly like the reference
    * (src/db.rs:78-113): revision from committed batch ranges (the
    * index-length analogue), last_modified from file mtime, usage from
    * on-disk byte size. O(#files) with zero data scanned — the shape
    * that survives millions of streams. For a scan-derived aggregate
    * (count/max/sum over rows, SURVEY.md §3.3) see streamsExact. */
  def streams(u: String, sort: StreamSort = StreamSort.IdAsc)
      : Seq[StreamMeta] = {
    val uDir = userPath(u)
    if (!Files.isDirectory(uDir)) return Nil
    val metas = Files.list(uDir).iterator().asScala
      .filter(Files.isDirectory(_)).flatMap { sDir =>
        val files = Files.list(sDir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toList
        if (files.isEmpty) None
        else {
          val sid = Base32.decodeString(sDir.getFileName.toString)
          Some(StreamMeta(sid, revision(u, sid),
            new Timestamp(files.map(Files.getLastModifiedTime(_).toMillis)
              .max),
            files.map(Files.size).sum))
        }
      }.toSeq
    StreamSort.applyLocal(sort, metas) // reference src/api.rs:320-335
  }

  /** Scan-derived stream metadata (count/max/sum groupBy over rows —
    * the one genuine shuffle in the reference surface, SURVEY.md §3.3).
    * Same shape as the q22/q23 gate queries; use when row-level truth is
    * needed rather than storage accounting. */
  def streamsExact(u: String, sort: StreamSort = StreamSort.IdAsc)
      : Seq[StreamMeta] = {
    val df = userEvents(u)
    if (df.isEmpty) return Nil
    val agg = df.groupBy($"stream_id")
      .agg(
        count(lit(1)).as("revision"),
        max($"ingest_ts").as("last_modified"),
        sum(length(to_json(struct(
          $"specversion", $"id", $"source", $"type", $"subject", $"time",
          $"datacontenttype", $"dataschema", $"data", $"data_base64",
          $"extensions")))).cast("long").as("usage"))
    val sorted = sort.apply(agg)
    sorted.collect().toSeq.map(r => StreamMeta(
      r.getAs[String]("stream_id"), r.getAs[Long]("revision"),
      r.getAs[Timestamp]("last_modified"), r.getAs[Long]("usage")))
  }

  def getStream(u: String, s: String): Option[StreamMeta] =
    streams(u).find(_.id == s)

  /** Compact a stream's per-batch files into one revision-sorted file —
    * the answer to append-path small-file pressure (SURVEY.md §7 "hard
    * parts"). Returns the number of files replaced (0 = nothing to do).
    * Runs under the stream's writer lock so appends serialize with it;
    * concurrent READS of this stream planned mid-compaction may observe
    * deleted part files (a transactional table format's versioned log is
    * the at-scale fix) — subsequent reads see exactly the same rows,
    * now with one file and full row-group min/max locality on revision. */
  def compactStream(u: String, s: String): Int =
    lockFor(u, s).synchronized {
      val dir = streamPath(u, s)
      if (!Files.isDirectory(dir)) return 0
      val old = Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList
      if (old.size <= 1) return 0
      val last = revision(u, s) - 1
      // rewrite via executors (never collect a whole stream to the
      // driver), sorted by revision for row-group stat locality
      val tmp = Files.createTempDirectory(root, ".compact-")
      try {
        spark.read.parquet(dir.toString).as[StoredEvent]
          .orderBy($"revision").coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(tmp.resolve("out").toString)
        val part = Files.list(tmp.resolve("out")).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException("no compacted file"))
        val target = dir.resolve(
          s"batch-0-$last-${java.util.UUID.randomUUID()}.parquet")
        Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
        old.foreach(Files.delete(_))
        old.size
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }

  /** Delete a stream — reference src/server.rs:251-261; returns whether
    * it existed (→ 204 vs 404, src/api.rs:421-423). */
  def deleteStream(u: String, s: String): Boolean =
    lockFor(u, s).synchronized {
      val dir = streamPath(u, s)
      val existed = Files.isDirectory(dir)
      if (existed) org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      revisions.remove(key(u, s))
      existed
    }

  /** Startup catalog recovery — reference src/server.rs:72-121: walk the
    * directory tree, base32-decode names. Returns (user, stream) pairs. */
  def recoverCatalog(): Seq[(String, String)] = {
    if (!Files.isDirectory(root)) return Nil
    (for {
      u <- Files.list(root).iterator().asScala
      if Files.isDirectory(u) && !u.getFileName.toString.startsWith(".") &&
        u.getFileName.toString != "lost+found" // server.rs:91-93
      s <- Files.list(u).iterator().asScala if Files.isDirectory(s)
    } yield (Base32.decodeString(u.getFileName.toString),
      Base32.decodeString(s.getFileName.toString))).toSeq
  }
}

object EventStore {
  private val BatchFile = """batch-(\d+)-(\d+)-.*\.parquet""".r

  def toCloudEvent(r: StoredEvent): CloudEvent =
    CloudEvent(r.specversion, r.id, r.source, r.`type`, r.subject, r.time,
      r.datacontenttype, r.dataschema, r.data, r.data_base64, r.extensions)
}

/** The six stream-list sort orders of the reference (src/api.rs:320-335;
  * `-` prefix = descending). */
sealed abstract class StreamSort(val apply: DataFrame => DataFrame)
object StreamSort {
  import org.apache.spark.sql.functions.col
  case object IdAsc extends StreamSort(_.orderBy(col("stream_id").asc))
  case object UsageAsc extends StreamSort(_.orderBy(col("usage").asc))
  case object UsageDesc extends StreamSort(_.orderBy(col("usage").desc))
  case object RevisionAsc extends StreamSort(_.orderBy(col("revision").asc))
  case object RevisionDesc extends StreamSort(_.orderBy(col("revision").desc))
  case object LastModifiedAsc
      extends StreamSort(_.orderBy(col("last_modified").asc))
  case object LastModifiedDesc
      extends StreamSort(_.orderBy(col("last_modified").desc))

  /** Local (already-collected) counterpart of the DataFrame sorts, for
    * the metadata-only listing. Same six orders, same tie behavior
    * (stable sort, id ascending as the implicit tiebreak). */
  def applyLocal(sort: StreamSort, metas: Seq[StreamMeta])
      : Seq[StreamMeta] = {
    val byId = metas.sortBy(_.id)
    sort match {
      case IdAsc => byId
      case UsageAsc => byId.sortBy(_.usage)
      case UsageDesc => byId.sortBy(-_.usage)
      case RevisionAsc => byId.sortBy(_.revision)
      case RevisionDesc => byId.sortBy(-_.revision)
      case LastModifiedAsc => byId.sortBy(_.last_modified.getTime)
      case LastModifiedDesc => byId.sortBy(-_.last_modified.getTime)
    }
  }

  /** Parse the reference's `?sort=` parameter (unknown → None → 400). */
  def parse(s: String): Option[StreamSort] = s match {
    case "id" => Some(IdAsc)
    case "usage" => Some(UsageAsc)
    case "-usage" => Some(UsageDesc)
    case "revision" => Some(RevisionAsc)
    case "-revision" => Some(RevisionDesc)
    case "last_modified" => Some(LastModifiedAsc)
    case "-last_modified" => Some(LastModifiedDesc)
    case _ => None
  }
}
