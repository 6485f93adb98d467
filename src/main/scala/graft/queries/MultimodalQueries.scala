package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface: opaque binary payloads + typed metadata
  * (north-star op). The media table is synthesized deterministically from
  * `documents` (no binary fixture exists), so the metadata/byte queries
  * are oracle-checkable; the decode stage itself is the stubbed boundary
  * (see graft.multimodal.Multimodal) and checked by ScalaTest instead.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, d: String): DataFrame =
    Multimodal.syntheticMediaTable(Tables.documents(s, d))

  /** q41: per-kind media stats over binary payloads + typed metadata. */
  val q41_media_meta: Q = (s, d) =>
    media(s, d).groupBy(col("meta.kind").as("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("payload")).cast("long")).cast("long")
          .as("total_bytes"),
        max(col("meta.width")).as("max_width"),
        max(col("meta.n_frames")).as("max_frames"))

  val q41_oracle: String =
    """SELECT kind, count(*) AS n_media,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       max(width) AS max_width, max(n_frames) AS max_frames
       FROM (SELECT encode(text) AS payload,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 640 ELSE 0 END AS max_w_in,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 640 ELSE 0 END AS INT) AS width,
         CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 100 + 1 ELSE 1 END
              AS INT) AS n_frames
       FROM documents)
       GROUP BY kind"""

  /** q42: frame sampling (video rows → one row per strided frame). */
  val q42_frame_sample: Q = (s, d) => {
    import s.implicits._
    Multimodal.sampleFrames(
      media(s, d).as[Multimodal.MediaRow], stride = 4)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"))
  }

  val q42_oracle: String =
    """SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx FROM (
         SELECT doc_id AS media_id, doc_id % 3 AS k,
           unnest(range(0,
             CASE WHEN doc_id % 3 = 2 THEN doc_id % 100 + 1 ELSE 1 END,
             4)) AS frame_idx
         FROM documents)
       WHERE k = 2"""

  /** q43: byte-level payload features (honest container fingerprint —
    * NOT a codec; video has no codec in this environment, see
    * Multimodal.byteFeatures) feeding a per-kind aggregate. Rows-only
    * check — the feature hash is JVM-side; determinism + schema are
    * asserted in ScalaTest. */
  val q43_media_features: Q = (s, d) => {
    import s.implicits._
    Multimodal.byteFeatures(media(s, d).as[Multimodal.MediaRow], dim = 16)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        avg(element_at(col("features"), 1)).as("avg_f0"),
        sum(col("n_bytes")).as("total_bytes"))
  }

  /** q53: REAL image decode — synthesize deterministic PNGs, decode with
    * the JDK's ImageIO, aggregate decoded dimensions + channel means.
    * Rows-only check (binary payloads aren't DuckDB-expressible); the
    * decoded-width==metadata and determinism properties are asserted in
    * MultimodalSpec. */
  val q53_image_decode: Q = (s, d) => {
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImageTable(Tables.documents(s, d)))
    feats.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_images"),
        avg(element_at(col("features"), 1)).as("avg_width"),
        avg(element_at(col("features"), 3)).as("avg_r"),
        sum(col("n_bytes")).as("png_bytes"))
  }

  /** q58: REAL audio decode — deterministic WAV clips decoded with the
    * JDK's AudioSystem; per-frequency-band aggregates of RMS and
    * zero-crossing rate. Rows-only (binary payloads aren't
    * oracle-expressible); decode fidelity asserted in MultimodalSpec. */
  val q58_audio_decode: Q = (s, d) => {
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.syntheticAudioTable(Tables.documents(s, d)))
    feats.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_clips"),
        avg(element_at(col("features"), 3)).as("avg_rms"),
        avg(element_at(col("features"), 4)).as("avg_zcr"),
        sum(col("n_bytes")).as("wav_bytes"))
  }

  val all: Map[String, Q] = Map(
    "q58_audio_decode" -> q58_audio_decode,
    "q53_image_decode" -> q53_image_decode,
    "q41_media_meta" -> q41_media_meta,
    "q42_frame_sample" -> q42_frame_sample,
    "q43_media_features" -> q43_media_features)

  val oracles: Map[String, String] = Map(
    "q41_media_meta" -> q41_oracle,
    "q42_frame_sample" -> q42_oracle)
}
