package graft.queries

import graft.Tables
import graft.multimodal.{Avi, Multimodal}
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
    * Multimodal.byteFeatures) as per-kind × per-bucket byte counts.
    * ORACLE-EXACT since r06: the histogram bucket of a byte is
    * floorMod(b, 16) = its LOW NIBBLE, the payload is the UTF-8 text,
    * and the per-doc byte count is small enough that the normalized
    * Float feature recovers the integer count exactly
    * (round(f·n_bytes); error ≤ n·2⁻²⁴ ≪ 0.5) — so DuckDB recomputes
    * the whole histogram from hex(encode(text)) while Spark reads it
    * back out of the operator's Float features. */
  val q43_media_features: Q = (s, d) => {
    import s.implicits._
    Multimodal.byteFeatures(media(s, d).as[Multimodal.MediaRow], dim = 16)
      .select(col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("nibble", "f")))
      .select(col("kind"), col("nibble").cast("long").as("nibble"),
        round(col("f") * col("n_bytes")).cast("long").as("c"))
      .groupBy(col("kind"), col("nibble"))
      .agg(sum(col("c")).as("n_bytes_nibble"))
  }

  val q43_oracle: String =
    """WITH b AS (SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
       FROM documents),
       d AS (SELECT b.kind,
           strpos('0123456789ABCDEF', substr(b.h, 2 * t.i, 1)) - 1
             AS nibble
         FROM b, unnest(range(1, b.n + 1)) AS t(i)),
       agg AS (SELECT kind, nibble, count(*) AS c
               FROM d GROUP BY 1, 2),
       grid AS (SELECT kind, t.i AS nibble
                FROM (SELECT DISTINCT kind FROM b),
                     unnest(range(0, 16)) AS t(i))
       SELECT g.kind, CAST(g.nibble AS BIGINT) AS nibble,
         CAST(coalesce(a.c, 0) AS BIGINT) AS n_bytes_nibble
       FROM grid g LEFT JOIN agg a
         ON g.kind = a.kind AND g.nibble = a.nibble"""

  /** q53: REAL image decode — synthesize deterministic PNGs, decode
    * with the JDK's ImageIO, aggregate decoded dimensions + channel
    * SUMS. ORACLE-EXACT since r06: the pixel pattern is pure integer
    * bit-arithmetic ((id·2654435761 + 31x + 131y) & 0xffffff), the
    * image is 8×8 so the stored Float channel means are rs/64 —
    * division by a power of two, exact for any 14-bit sum — and DuckDB
    * recomputes the sums ANALYTICALLY from doc_id while Spark reads
    * them back out of the actual PNG through the actual codec. A
    * channel swap, pixel misread, or PNG roundtrip bug flips an
    * integer and fails the hash. (PNG byte size stays OUT of the
    * oracle: it depends on the JDK's deflate, not on the data.) */
  val q53_image_decode: Q = (s, d) => {
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.syntheticImageTable(Tables.documents(s, d)))
    feats.select(
        (col("media_id") % 4).as("img_group"),
        element_at(col("features"), 1).cast("long").as("w"),
        element_at(col("features"), 2).cast("long").as("h"),
        round(element_at(col("features"), 3) * 64).cast("long").as("rs"),
        round(element_at(col("features"), 4) * 64).cast("long").as("gs"),
        round(element_at(col("features"), 5) * 64).cast("long").as("bs"))
      .groupBy(col("img_group"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("w")).as("sum_width"),
        sum(col("h")).as("sum_height"),
        sum(col("rs")).as("sum_r"),
        sum(col("gs")).as("sum_g"),
        sum(col("bs")).as("sum_b"))
  }

  val q53_oracle: String =
    """WITH px AS (
         SELECT d.doc_id,
           ((d.doc_id * 2654435761 + x.i * 31 + y.i * 131) & 16777215)
             AS v
         FROM documents d, range(0, 8) x(i), range(0, 8) y(i)),
       per AS (
         SELECT doc_id,
           sum((v >> 16) & 255) AS rs,
           sum((v >> 8) & 255) AS gs,
           sum(v & 255) AS bs
         FROM px GROUP BY doc_id)
       SELECT doc_id % 4 AS img_group,
         count(*) AS n_images,
         CAST(count(*) * 8 AS BIGINT) AS sum_width,
         CAST(count(*) * 8 AS BIGINT) AS sum_height,
         CAST(sum(rs) AS BIGINT) AS sum_r,
         CAST(sum(gs) AS BIGINT) AS sum_g,
         CAST(sum(bs) AS BIGINT) AS sum_b
       FROM per GROUP BY 1"""

  /** q58: REAL audio decode — deterministic square-wave WAV clips
    * decoded with the JDK's AudioSystem; per-amplitude aggregates of
    * decoded RMS and zero-crossing counts. ORACLE-EXACT since r06: the
    * square wave makes every decoded feature integer arithmetic (RMS =
    * amplitude; crossings = (freq·799)/4000, see
    * Multimodal.syntheticAudioTable), so DuckDB computes the expected
    * values ANALYTICALLY from doc_id while Spark derives them from the
    * actual WAV bytes through the actual codec — a sharp end-to-end
    * check of synthesis, container write, decode, and features. The
    * container size rides along (44-byte canonical WAV header + 1600
    * PCM bytes), pinning the encoder too. */
  val q58_audio_decode: Q = (s, d) => {
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.syntheticAudioTable(Tables.documents(s, d)))
    feats.select(
        // RMS of a ±A square wave is exactly A (sqrt of a perfect
        // square); stored as Float, recovered integer-exactly
        element_at(col("features"), 3).cast("long").as("amplitude"),
        // zcr float = crossings/n with n=800: recover the integer count
        round(element_at(col("features"), 4) *
          element_at(col("features"), 1)).cast("long").as("crossings"),
        element_at(col("features"), 1).cast("long").as("n_samples"),
        col("n_bytes"))
      .groupBy(col("amplitude"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("crossings")).as("total_crossings"),
        sum(col("n_samples")).as("total_samples"),
        sum(col("n_bytes")).as("wav_bytes"))
  }

  val q58_oracle: String =
    """WITH a AS (SELECT doc_id,
         200 + (doc_id % 40) * 20 AS f,
         6000 + (doc_id % 10) * 600 AS amp
       FROM documents)
       SELECT CAST(amp AS BIGINT) AS amplitude,
         count(*) AS n_clips,
         CAST(sum((f * 799) // 4000) AS BIGINT) AS total_crossings,
         CAST(count(*) * 800 AS BIGINT) AS total_samples,
         CAST(count(*) * 1644 AS BIGINT) AS wav_bytes
       FROM a GROUP BY 1"""

  /** q87: REAL video frame decode — synthesize deterministic
    * multi-frame animated GIFs (a genuine video container with a
    * pure-JVM codec), walk them with ImageIO's multi-frame reader
    * sampling every 2nd frame, and emit per-frame decoded dimensions +
    * channel sums. ORACLE-EXACT by construction: frames are 8×8
    * indexed-color with the closed-form palette R(i)=i, G(i)=255−i,
    * B(i)=(73·i) mod 256 and pixel index (id·2654435761 + 977f + 31x +
    * 131y) mod 256 — GIF is lossless at ≤256 colors, so DuckDB
    * recomputes every channel sum ANALYTICALLY from doc_id while Spark
    * reads them out of the actual container through the actual codec.
    * A dropped frame, frame-order bug, palette swap, or LZW roundtrip
    * bug flips an integer and fails the hash. The sampled frame list
    * comes from the CONTAINER's frame count, not metadata, so the
    * row set itself pins `getNumImages`. (Container byte size stays
    * out: it depends on the encoder's LZW choices, not the data.) */
  val q87_video_decode: Q = (s, d) => {
    val frames = Multimodal.decodeVideoFrames(
      Multimodal.syntheticVideoTable(Tables.documents(s, d)), stride = 2)
    frames.select(
      col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      col("frame_w").cast("long").as("frame_w"),
      col("frame_h").cast("long").as("frame_h"),
      col("sum_r"), col("sum_g"), col("sum_b"))
  }

  val q87_oracle: String =
    """WITH f AS (SELECT doc_id, CAST(doc_id % 5 + 2 AS INT) AS nf
         FROM documents),
       fr AS (SELECT doc_id, CAST(t.i AS INT) AS frame_idx
         FROM f, unnest(range(0, nf, 2)) AS t(i)),
       px AS (SELECT doc_id, frame_idx,
           ((doc_id * 2654435761 + frame_idx * 977 + x.i * 31 + y.i * 131)
             & 255) AS idx
         FROM fr, range(0, 8) AS x(i), range(0, 8) AS y(i))
       SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         CAST(8 AS BIGINT) AS frame_w, CAST(8 AS BIGINT) AS frame_h,
         CAST(sum(idx) AS BIGINT) AS sum_r,
         CAST(sum(255 - idx) AS BIGINT) AS sum_g,
         CAST(sum((idx * 73) & 255) AS BIGINT) AS sum_b
       FROM px GROUP BY 1, 2"""

  /** q88: perceptual average-hash over REAL decoded pixels — the
    * image near-dup fingerprint. ORACLE-EXACT by the q53 trick: the
    * synthetic pixels are pure integer bit-arithmetic from doc_id, and
    * aHash itself is all-integer (gray = r+g+b, bit = gray·64 > Σgray,
    * bits packed as two 32-bit halves so no engine disagrees about the
    * sign bit), so DuckDB recomputes every hash analytically while
    * Spark derives it from the actual PNG bytes through the actual
    * codec. Any pixel misread, channel swap, bit-order or threshold
    * bug flips a packed bit and fails the hash compare. */
  val q88_image_ahash: Q = (s, d) =>
    Multimodal.imageAHash(
      Multimodal.syntheticImageTable(Tables.documents(s, d)))

  val q88_oracle: String =
    """WITH px AS (
         SELECT doc_id, idx,
           ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255) AS gray
         FROM (SELECT d.doc_id, y.i * 8 + x.i AS idx,
                 ((d.doc_id * 2654435761 + x.i * 31 + y.i * 131)
                   & 16777215) AS v
               FROM documents d, range(0, 8) x(i), range(0, 8) y(i))),
       tot AS (SELECT doc_id, sum(gray) AS total FROM px GROUP BY 1)
       SELECT p.doc_id AS media_id,
         CAST(sum(CASE WHEN p.idx < 32 AND p.gray * 64 > t.total
           THEN 1::BIGINT << p.idx ELSE 0 END) AS BIGINT) AS ahash_lo,
         CAST(sum(CASE WHEN p.idx >= 32 AND p.gray * 64 > t.total
           THEN 1::BIGINT << (p.idx - 32) ELSE 0 END) AS BIGINT)
           AS ahash_hi,
         CAST(sum(CASE WHEN p.gray * 64 > t.total THEN 1 ELSE 0 END)
           AS BIGINT) AS n_bright
       FROM px p JOIN tot t USING (doc_id)
       GROUP BY 1"""

  /** q89: REAL AVI container decode — the second genuine video path
    * (RIFF walk: avih/strh/strf headers, movi frame chunks, idx1),
    * with uncompressed BI_RGB frames so the decode is lossless and the
    * oracle analytic. Frames are 6×6 (an 18-byte pixel row padded to a
    * 20-byte DIB stride — the gate exercises row padding), bottom-up
    * BGR, pixel u = (id·1099087573 + 769f + 37x + 101y) mod 256 with
    * R=u, G=255−u, B=73u mod 256; stride-2 sampling. A header misparse,
    * stride bug, BGR/RGB swap, row-order flip, or chunk-walk error
    * flips an integer and fails the hash. MJPG is oracle-gated by q92
    * (exact-by-construction JPEG) and spec-gated in AviSpec. */
  val q89_avi_frames: Q = (s, d) => {
    val frames = Avi.decodeAviFrames(
      Avi.syntheticAviTable(Tables.documents(s, d)), stride = 2)
    frames.select(
      col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      col("frame_w").cast("long").as("frame_w"),
      col("frame_h").cast("long").as("frame_h"),
      col("sum_r"), col("sum_g"), col("sum_b"))
  }

  val q89_oracle: String =
    """WITH f AS (SELECT doc_id, CAST(doc_id % 4 + 2 AS INT) AS nf
         FROM documents),
       fr AS (SELECT doc_id, CAST(t.i AS INT) AS frame_idx
         FROM f, unnest(range(0, nf, 2)) AS t(i)),
       px AS (SELECT doc_id, frame_idx,
           ((doc_id * 1099087573 + frame_idx * 769 + x.i * 37 + y.i * 101)
             & 255) AS u
         FROM fr, range(0, 6) AS x(i), range(0, 6) AS y(i))
       SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         CAST(6 AS BIGINT) AS frame_w, CAST(6 AS BIGINT) AS frame_h,
         CAST(sum(u) AS BIGINT) AS sum_r,
         CAST(sum(255 - u) AS BIGINT) AS sum_g,
         CAST(sum((u * 73) & 255) AS BIGINT) AS sum_b
       FROM px GROUP BY 1, 2"""

  /** q92: MJPG AVI decode, ORACLE-EXACT — the upgrade from q89's
    * spec-gated MJPG: frames are genuine baseline JPEGs built by
    * [[graft.multimodal.Jpeg.encodeConstantBlocks]] (constant 8×8
    * blocks + flat quant table + constant-128 chroma), the one corner
    * of JPEG where the codec is lossless, so ImageIO's real Huffman/
    * dequant/IDCT/color-convert path lands on closed-form integers:
    * block (bx,by) of frame f decodes to 64 pixels of exactly
    * u(id,f,bx,by), R=G=B=u. A Huffman table bug, DC predictor slip,
    * IDCT rounding change, or chroma leak shifts a sum and fails the
    * hash. */
  val q92_mjpg_frames: Q = (s, d) => {
    val frames = Avi.decodeAviFrames(
      Avi.syntheticMjpegTable(Tables.documents(s, d)), stride = 1)
    frames.select(
      col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      col("frame_w").cast("long").as("frame_w"),
      col("frame_h").cast("long").as("frame_h"),
      col("sum_r"), col("sum_g"), col("sum_b"))
  }

  val q92_oracle: String =
    """WITH f AS (SELECT doc_id, CAST(doc_id % 3 + 2 AS INT) AS nf
         FROM documents),
       fr AS (SELECT doc_id, CAST(t.i AS INT) AS frame_idx
         FROM f, unnest(range(0, nf)) AS t(i)),
       blk AS (SELECT doc_id, frame_idx,
           ((doc_id * 1099087573 + frame_idx * 769 + x.i * 37 + y.i * 101)
             & 255) AS u
         FROM fr, range(0, 2) AS x(i), range(0, 2) AS y(i))
       SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         CAST(16 AS BIGINT) AS frame_w, CAST(16 AS BIGINT) AS frame_h,
         CAST(sum(u) * 64 AS BIGINT) AS sum_r,
         CAST(sum(u) * 64 AS BIGINT) AS sum_g,
         CAST(sum(u) * 64 AS BIGINT) AS sum_b
       FROM blk GROUP BY 1, 2"""

  /** q100: IMAGE near-dup pairs — the multimodal counterpart of the
    * MinHash text dedup family. The corpus is every fixture image plus
    * a one-pixel-perturbed twin under a shifted id (the SCRAMBLED
    * generator: distinct doc ids share no pixel structure, so aHashes
    * only collide for true near-dups — the plain gradient table's
    * hashes collide corpus-wide and would make the output quadratic).
    * Spark decodes the real PNG bytes through the real codec, aHashes
    * them (q88's path), and pairs fingerprints within hamming ≤ 3 via
    * Dedup.hammingHalvesPairs. Candidate generation is EXACT by
    * pigeonhole (4 disjoint 16-bit bands, ≤3 differing bits ⟹ ≥1 band
    * agrees), so the oracle is the analytic all-pairs hamming join
    * over hashes DuckDB recomputes from doc_id — including however
    * many bits the perturbation's threshold shift actually flips
    * (twins past the radius drop out in BOTH engines). */
  val q100_image_neardup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val imgs = Multimodal.scrambledImageTable(docs)
      .unionByName(Multimodal.scrambledImageTable(docs,
        idShift = 10000000L, pixel0Delta = 40L))
    graft.operators.Dedup.hammingHalvesPairs(
      Multimodal.imageAHash(imgs),
      "media_id", "ahash_lo", "ahash_hi", maxHamming = 3)
  }

  val q100_oracle: String =
    """WITH m AS (SELECT doc_id, doc_id AS mid, 0 AS delta
           FROM documents
         UNION ALL
         SELECT doc_id, doc_id + 10000000, 40 FROM documents),
       px AS (
         SELECT mid, idx,
           ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255) AS gray
         FROM (SELECT m.mid, u.i AS idx,
                 ((((((m.doc_id * 2654435761) & 16777215) + u.i)
                     * 2654435761) & 16777215)
                  + (CASE WHEN u.i = 0 THEN m.delta ELSE 0 END))
                   & 16777215 AS v
               FROM m, range(0, 64) u(i))),
       tot AS (SELECT mid, sum(gray) AS total FROM px GROUP BY 1),
       h AS (SELECT p.mid,
           CAST(sum(CASE WHEN p.idx < 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << p.idx ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN p.idx >= 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << (p.idx - 32) ELSE 0 END) AS BIGINT) AS hi
         FROM px p JOIN tot t USING (mid)
         GROUP BY 1)
       SELECT a.mid AS id_a, b.mid AS id_b,
         CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
           AS BIGINT) AS hamming
       FROM h a JOIN h b ON a.mid < b.mid
       WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3"""

  /** q105: IMAGE near-dup pairs with the degenerate-bucket cap
    * BINDING — q100's corpus has 679 distinct aHashes over 1000 images
    * (so the identical-fingerprint collapse is live on this very
    * fixture: 321 images ride the full-hash equi-join, immune to the
    * cap) and distinct-fp band buckets up to 5; maxBucket=3 genuinely
    * drops the 4s and 5s from candidate generation. The oracle
    * recomputes the CAPPED semantics — distinct-fp banding, bucket
    * census, cap filter, hamming rerank, member expansion — in SQL
    * (the q95/q104 pattern), so the gate is exact no matter which true
    * pairs the cap prices out. This is the 100 TB posture for media
    * corpora, where blank/solid frames make one aHash bucket hold
    * millions of rows: those rows pair through the output-bounded
    * equi-join, never through banding. */
  val q105_image_neardup_capped: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val imgs = Multimodal.scrambledImageTable(docs)
      .unionByName(Multimodal.scrambledImageTable(docs,
        idShift = 10000000L, pixel0Delta = 40L))
    graft.operators.Dedup.hammingHalvesPairs(
      Multimodal.imageAHash(imgs),
      "media_id", "ahash_lo", "ahash_hi", maxHamming = 3,
      maxBucket = Some(3))
  }

  val q105_oracle: String =
    """WITH m AS (SELECT doc_id, doc_id AS mid, 0 AS delta
           FROM documents
         UNION ALL
         SELECT doc_id, doc_id + 10000000, 40 FROM documents),
       px AS (
         SELECT mid, idx,
           ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255) AS gray
         FROM (SELECT m.mid, u.i AS idx,
                 ((((((m.doc_id * 2654435761) & 16777215) + u.i)
                     * 2654435761) & 16777215)
                  + (CASE WHEN u.i = 0 THEN m.delta ELSE 0 END))
                   & 16777215 AS v
               FROM m, range(0, 64) u(i))),
       tot AS (SELECT mid, sum(gray) AS total FROM px GROUP BY 1),
       h AS (SELECT p.mid,
           CAST(sum(CASE WHEN p.idx < 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << p.idx ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN p.idx >= 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << (p.idx - 32) ELSE 0 END) AS BIGINT) AS hi
         FROM px p JOIN tot t USING (mid)
         GROUP BY 1),
       dfp AS (SELECT DISTINCT lo, hi FROM h),
       banded AS (
         SELECT 0 AS band, lo & 65535 AS bits, lo, hi FROM dfp
         UNION ALL SELECT 1, (lo >> 16) & 65535, lo, hi FROM dfp
         UNION ALL SELECT 2, hi & 65535, lo, hi FROM dfp
         UNION ALL SELECT 3, (hi >> 16) & 65535, lo, hi FROM dfp),
       ok AS (SELECT band, bits FROM banded
              GROUP BY 1, 2 HAVING count(*) <= 3),
       capb AS (SELECT bn.* FROM banded bn JOIN ok USING (band, bits)),
       cand AS (
         SELECT DISTINCT x.lo AS la, x.hi AS ha, y.lo AS lb, y.hi AS hb,
           CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
             AS BIGINT) AS hamming
         FROM capb x JOIN capb y ON x.band = y.band AND x.bits = y.bits
         WHERE (x.lo, x.hi) < (y.lo, y.hi)),
       eqp AS (
         SELECT a.mid AS id_a, b.mid AS id_b, CAST(0 AS BIGINT) AS hamming
         FROM h a JOIN h b
           ON a.lo = b.lo AND a.hi = b.hi AND a.mid < b.mid),
       crossp AS (
         SELECT least(a.mid, b.mid) AS id_a,
           greatest(a.mid, b.mid) AS id_b, c.hamming
         FROM cand c
         JOIN h a ON a.lo = c.la AND a.hi = c.ha
         JOIN h b ON b.lo = c.lb AND b.hi = c.hb
         WHERE c.hamming <= 3)
       SELECT id_a, id_b, hamming FROM eqp
       UNION ALL SELECT id_a, id_b, hamming FROM crossp"""

  /** q107: INCREMENTAL image near-dup — q101's delta-vs-lake shape for
    * the perceptual-hash family. The corpus is the base scrambled
    * image table (already ingested); the batch is the one-pixel-
    * perturbed twin delivery under shifted ids. Both sides decode
    * through the real PNG codec to aHashes; incrementalHammingPairs
    * broadcast-joins the batch's pigeonhole bands against ONE corpus
    * scan (the corpus never shuffles — the fingerprint is the rerank
    * input, so even the exact hamming filter runs inline in the scan
    * stage). Candidates are EXACT by pigeonhole, so the oracle is the
    * analytic cross-slice all-pairs hamming join over hashes DuckDB
    * recomputes from doc_id. */
  val q107_incremental_image_neardup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val corpus = Multimodal.imageAHash(
      Multimodal.scrambledImageTable(docs))
    val batch = Multimodal.imageAHash(
      Multimodal.scrambledImageTable(docs,
        idShift = 10000000L, pixel0Delta = 40L))
    graft.operators.Dedup.incrementalHammingPairs(batch, corpus,
      "media_id", "ahash_lo", "ahash_hi", maxHamming = 3)
  }

  val q107_oracle: String =
    """WITH m AS (SELECT doc_id, doc_id AS mid, 0 AS delta
           FROM documents
         UNION ALL
         SELECT doc_id, doc_id + 10000000, 40 FROM documents),
       px AS (
         SELECT mid, idx,
           ((v >> 16) & 255) + ((v >> 8) & 255) + (v & 255) AS gray
         FROM (SELECT m.mid, u.i AS idx,
                 ((((((m.doc_id * 2654435761) & 16777215) + u.i)
                     * 2654435761) & 16777215)
                  + (CASE WHEN u.i = 0 THEN m.delta ELSE 0 END))
                   & 16777215 AS v
               FROM m, range(0, 64) u(i))),
       tot AS (SELECT mid, sum(gray) AS total FROM px GROUP BY 1),
       h AS (SELECT p.mid,
           CAST(sum(CASE WHEN p.idx < 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << p.idx ELSE 0 END) AS BIGINT) AS lo,
           CAST(sum(CASE WHEN p.idx >= 32 AND p.gray * 64 > t.total
             THEN 1::BIGINT << (p.idx - 32) ELSE 0 END) AS BIGINT) AS hi
         FROM px p JOIN tot t USING (mid)
         GROUP BY 1)
       SELECT b.mid AS id_b, c.mid AS id_c,
         CAST(bit_count(xor(b.lo, c.lo)) + bit_count(xor(b.hi, c.hi))
           AS BIGINT) AS hamming
       FROM h b JOIN h c
         ON b.mid >= 10000000 AND c.mid < 10000000
       WHERE bit_count(xor(b.lo, c.lo)) + bit_count(xor(b.hi, c.hi)) <= 3"""

  /** q102: AUDIO fingerprint dedup — the audio counterpart of q100's
    * image near-dup. Corpus = every fixture clip plus an
    * amplitude-shifted twin under a new id; Spark decodes the real WAV
    * bytes through the real javax.sound codec, packs the signs of 64
    * strided samples (Multimodal.audioSignHash — volume-invariant by
    * construction), and groups identical fingerprints (keeper = min
    * id, duplicate count). The twins' WAV BYTES differ from their
    * originals (different amplitude), so a byte hash would split every
    * group — the sign fingerprint merging them is exactly the
    * perceptual-dedup claim, and DuckDB recomputes every fingerprint
    * from the square wave's closed form (the q58 trick). */
  val q102_audio_fingerprint: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val clips = Multimodal.syntheticAudioTable(docs)
      .unionByName(Multimodal.syntheticAudioTable(docs,
        idShift = 10000000L, ampShift = 900))
    Multimodal.audioSignHash(clips)
      .groupBy(col("sig_lo"), col("sig_hi"))
      .agg(min(col("media_id")).as("keeper"),
        count(lit(1)).as("n_copies"))
  }

  val q102_oracle: String =
    """WITH m AS (SELECT doc_id, doc_id AS mid FROM documents
         UNION ALL
         SELECT doc_id, doc_id + 10000000 FROM documents),
       b AS (SELECT mid, j.i AS j,
           CASE WHEN ((((200 + (doc_id % 40) * 20) * (j.i * 12))
                       // 4000) % 2) = 0
             THEN 1 ELSE 0 END AS bit
         FROM m, range(0, 64) j(i)),
       h AS (SELECT mid,
           CAST(sum(CASE WHEN j < 32 AND bit = 1
             THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sig_lo,
           CAST(sum(CASE WHEN j >= 32 AND bit = 1
             THEN 1::BIGINT << (j - 32) ELSE 0 END) AS BIGINT) AS sig_hi
         FROM b GROUP BY 1)
       SELECT sig_lo, sig_hi, CAST(min(mid) AS BIGINT) AS keeper,
         CAST(count(*) AS BIGINT) AS n_copies
       FROM h GROUP BY sig_lo, sig_hi"""

  /** q103: CROSS-CONTAINER video dedup — the capstone of the
    * perceptual-fingerprint family. The corpus holds every fixture
    * video twice: as an animated GIF (LZW, palette) and as an AVI/DIB
    * twin (uncompressed BGR, bottom-up rows, RIFF framing) carrying
    * the SAME decoded pixels under a shifted id. Spark walks BOTH real
    * containers through the container-agnostic decodeFrames dispatch,
    * fingerprints the DECODED content (videoContentFingerprint), and
    * groups — every group must merge one GIF with its AVI twin
    * (n_copies = 2), which no byte/container-level hash can do. DuckDB
    * recomputes every fingerprint from the closed-form pixels, so a
    * palette mixup, row-order flip, stride bug, or frame-order
    * divergence in EITHER codec path splits a group and fails the
    * hash compare. */
  val q103_video_crossdedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val corpus = Multimodal.syntheticVideoTable(docs)
      .unionByName(Avi.syntheticGifTwinAviTable(docs,
        idShift = 20000000L))
    Multimodal.videoContentFingerprint(
        Multimodal.decodeFrames(corpus, stride = 1))
      .groupBy(col("fingerprint"))
      .agg(min(col("media_id")).as("keeper"),
        count(lit(1)).as("n_copies"),
        min(col("n_frames")).as("n_frames"))
  }

  val q103_oracle: String =
    """WITH m AS (SELECT doc_id, doc_id AS mid FROM documents
         UNION ALL
         SELECT doc_id, doc_id + 20000000 FROM documents),
       f AS (SELECT mid, doc_id, CAST(doc_id % 5 + 2 AS INT) AS nf
         FROM m),
       fr AS (SELECT mid, doc_id, CAST(t.i AS INT) AS fi
         FROM f, unnest(range(0, nf)) t(i)),
       px AS (SELECT mid, fi,
           ((doc_id * 2654435761 + fi * 977 + x.i * 31 + y.i * 131)
             & 255) AS k
         FROM fr, range(0, 8) x(i), range(0, 8) y(i)),
       s AS (SELECT mid, fi,
           CAST(sum(k) AS BIGINT) sr,
           CAST(sum(255 - k) AS BIGINT) sg,
           CAST(sum((k * 73) & 255) AS BIGINT) sb
         FROM px GROUP BY 1, 2),
       fp AS (SELECT mid,
           md5(string_agg('8:8:' || CAST(sr AS VARCHAR) || ':'
             || CAST(sg AS VARCHAR) || ':' || CAST(sb AS VARCHAR),
             ';' ORDER BY fi)) AS fingerprint,
           CAST(count(*) AS BIGINT) AS n_frames
         FROM s GROUP BY 1)
       SELECT fingerprint, CAST(min(mid) AS BIGINT) AS keeper,
         CAST(count(*) AS BIGINT) AS n_copies,
         min(n_frames) AS n_frames
       FROM fp GROUP BY 1"""

  /** q205: shot-boundary detection over REAL decoded video frames
    * ([[Multimodal.sceneCuts]] scaladoc — channel-sum L1 delta vs the
    * previous frame, the classic cheap cut detector). Spark decodes
    * the actual GIF containers at stride 1 and diffs codec output;
    * DuckDB recomputes every frame's channel sums ANALYTICALLY from
    * the closed-form synthetic pixels (the q87 contract) and replays
    * the lag + threshold. minDelta = 800 cuts through the fixture's
    * delta distribution (192..1728, median 704 — measured 637 of
    * 1500 transitions flagged at sf0.01), so both the delta
    * arithmetic and the boolean decision are load-bearing. */
  val q205_scene_cuts: Q = (s, d) =>
    Multimodal.sceneCuts(
      Multimodal.decodeVideoFrames(
        Multimodal.syntheticVideoTable(Tables.documents(s, d)),
        stride = 1),
      minDelta = 800L)

  val q205_oracle: String =
    """WITH f AS (SELECT doc_id, CAST(doc_id % 5 + 2 AS INT) AS nf
         FROM documents),
       fr AS (SELECT doc_id, CAST(t.i AS INT) AS fi
         FROM f, unnest(range(0, nf)) AS t(i)),
       px AS (SELECT doc_id, fi,
           ((doc_id * 2654435761 + fi * 977 + x.i * 31 + y.i * 131)
             & 255) AS idx
         FROM fr, range(0, 8) AS x(i), range(0, 8) AS y(i)),
       sums AS (SELECT doc_id, fi, sum(idx) AS sr,
           sum(255 - idx) AS sg, sum((idx * 73) & 255) AS sb
         FROM px GROUP BY 1, 2),
       d AS (SELECT doc_id, fi,
           abs(sr - lag(sr) OVER w) + abs(sg - lag(sg) OVER w)
             + abs(sb - lag(sb) OVER w) AS delta
         FROM sums WINDOW w AS (PARTITION BY doc_id ORDER BY fi))
       SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
         CAST(delta AS BIGINT) AS delta, delta > 800 AS is_cut
       FROM d WHERE delta IS NOT NULL"""

  val all: Map[String, Q] = Map(
    "q205_scene_cuts" -> q205_scene_cuts,
    "q103_video_crossdedup" -> q103_video_crossdedup,
    "q102_audio_fingerprint" -> q102_audio_fingerprint,
    "q100_image_neardup" -> q100_image_neardup,
    "q105_image_neardup_capped" -> q105_image_neardup_capped,
    "q107_incremental_image_neardup" -> q107_incremental_image_neardup,
    "q92_mjpg_frames" -> q92_mjpg_frames,
    "q89_avi_frames" -> q89_avi_frames,
    "q88_image_ahash" -> q88_image_ahash,
    "q87_video_decode" -> q87_video_decode,
    "q58_audio_decode" -> q58_audio_decode,
    "q53_image_decode" -> q53_image_decode,
    "q41_media_meta" -> q41_media_meta,
    "q42_frame_sample" -> q42_frame_sample,
    "q43_media_features" -> q43_media_features)

  val oracles: Map[String, String] = Map(
    "q205_scene_cuts" -> q205_oracle,
    "q103_video_crossdedup" -> q103_oracle,
    "q102_audio_fingerprint" -> q102_oracle,
    "q100_image_neardup" -> q100_oracle,
    "q105_image_neardup_capped" -> q105_oracle,
    "q107_incremental_image_neardup" -> q107_oracle,
    "q92_mjpg_frames" -> q92_oracle,
    "q89_avi_frames" -> q89_oracle,
    "q88_image_ahash" -> q88_oracle,
    "q41_media_meta" -> q41_oracle,
    "q42_frame_sample" -> q42_oracle,
    "q43_media_features" -> q43_oracle,
    "q53_image_decode" -> q53_oracle,
    "q58_audio_decode" -> q58_oracle,
    "q87_video_decode" -> q87_oracle)
}
