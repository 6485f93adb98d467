package graft.eventstore

import java.sql.Timestamp

/** A CloudEvents v1.0 record — the reference's wire/storage schema
  * (reference openapi.yaml:81-86; FIXTURES.md §A). Required fields per
  * spec: specversion, id, source, type. Everything else optional; open
  * extension attributes ride in `extensions` (string-typed, matching the
  * JSON wire form). `data` is kept as a raw JSON string — schema-on-read
  * via from_json/get_json_object, exactly how the reference treats it
  * (opaque bytes on disk, reference src/db.rs:205-210).
  */
case class CloudEvent(
    specversion: String = "1.0",
    id: String,
    source: String,
    `type`: String,
    subject: Option[String] = None,
    time: Option[Timestamp] = None,
    datacontenttype: Option[String] = None,
    dataschema: Option[String] = None,
    data: Option[String] = None,
    data_base64: Option[Array[Byte]] = None,
    extensions: Map[String, String] = Map.empty)

/** A committed event: CloudEvent + engine-assigned addressing columns.
  * `revision` is the dense 0-based per-stream position (reference
  * openapi.yaml:54-59, src/db.rs:103-113); `ingest_ts` is commit wall
  * time (the analogue of file mtime feeding last_modified,
  * reference src/db.rs:78-88).
  */
case class StoredEvent(
    user_id: String,
    stream_id: String,
    revision: Long,
    ingest_ts: Timestamp,
    specversion: String,
    id: String,
    source: String,
    `type`: String,
    subject: Option[String],
    time: Option[Timestamp],
    datacontenttype: Option[String],
    dataschema: Option[String],
    data: Option[String],
    data_base64: Option[Array[Byte]],
    extensions: Map[String, String])

/** Optimistic-concurrency expectation for append — semantics exactly
  * mirror the reference (src/db.rs:20-26, 189-194): Any always passes;
  * NoStream requires revision 0 (no events yet); StreamExists requires
  * revision > 0; Exact(n) requires current revision == n.
  */
sealed trait ExpectedRevision
object ExpectedRevision {
  case object Any extends ExpectedRevision
  case object NoStream extends ExpectedRevision
  case object StreamExists extends ExpectedRevision
  final case class Exact(n: Long) extends ExpectedRevision
}

/** Stream metadata (reference src/server.rs:39-46, assembled 233-248). */
case class StreamMeta(
    id: String,
    revision: Long,
    last_modified: Timestamp,
    usage: Long)

sealed abstract class EventStoreException(msg: String)
    extends RuntimeException(msg)
/** CAS failure → the reference's HTTP 409 (src/api.rs:509-523). */
final case class RevisionMismatch(expected: ExpectedRevision, actual: Long)
    extends EventStoreException(
      s"expected revision $expected but stream is at $actual")
/** (source,id) uniqueness violation → HTTP 409 (src/api.rs:524-537).
  * Specified-but-unimplemented in the reference (SURVEY.md §0, O14);
  * enforced for real here. */
final case class SourceIdConflict(source: String, id: String)
    extends EventStoreException(
      s"an event with source '$source' and id '$id' already exists " +
        "in the stream (CloudEvents §3: source+id must be unique)")
final case class StreamNotFound(userId: String, streamId: String)
    extends EventStoreException(s"stream $userId/$streamId not found")
case object EmptyAppend
    extends EventStoreException("refusing to append an empty batch")
