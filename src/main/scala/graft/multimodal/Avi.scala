package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import Multimodal.{FrameRow, MediaMeta, MediaRow, ensureCodecInit}

/** AVI (RIFF) video container support — the second REAL video path next
  * to the animated-GIF one in [[Multimodal.decodeVideoFrames]].
  *
  * AVI is a RIFF container (hematite treats media as opaque payloads;
  * the reference has no codec layer — this is north-star surface): a
  * `hdrl` LIST carrying the main + stream headers, a `movi` LIST with
  * one chunk per frame, and an `idx1` index. Two in-environment codecs
  * are real here, both pure JVM:
  *
  *  - `DIB ` / BI_RGB — uncompressed 24-bit bottom-up BGR frames with
  *    4-byte row padding (top-down via negative biHeight also handled).
  *    LOSSLESS, so a synthetic table of closed-form pixels stays
  *    DuckDB-oracle-exact through a genuine container walk (q89; the
  *    q87 trick without even a palette indirection).
  *  - `MJPG` — motion-JPEG: each `00dc` chunk is a baseline JPEG,
  *    decoded with ImageIO's JPEG codec. JPEG is lossy, so MJPG is
  *    spec-gated (container walk must reproduce exactly what ImageIO
  *    decodes from each extracted chunk), not oracle-gated.
  *
  * Scale notes: both directions are per-row CPU-bound `mapPartitions`
  * work — no shuffle, pipelines inside the scan stage, parallel with
  * input splits. The parser walks one in-memory payload with absolute
  * offsets (no allocation per chunk beyond the decoded frame).
  */
object Avi {

  private def fcc(s: String): Int = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)
  }
  private val RIFF = fcc("RIFF"); private val AVI = fcc("AVI ")
  private val LIST = fcc("LIST"); private val HDRL = fcc("hdrl")
  private val MOVI = fcc("movi"); private val STRL = fcc("strl")
  private val STRH = fcc("strh"); private val STRF = fcc("strf")
  private val AVIH = fcc("avih"); private val IDX1 = fcc("idx1")
  private val VIDS = fcc("vids"); private val MJPG = fcc("MJPG")
  private val DIB = fcc("DIB "); private val REC = fcc("rec ")
  // frame chunks are '##db' (uncompressed) / '##dc' (compressed), where
  // ## is the stream number — match on the codec suffix (high 16 bits)
  private val SufDb = fcc("00db") >>> 16
  private val SufDc = fcc("00dc") >>> 16

  /** Build a spec-valid single-video-stream AVI from pre-encoded frame
    * chunks (raw DIB pixel data for BI_RGB, whole JPEGs for MJPG).
    * `biHeight` may be negative for top-down DIB rows, per the
    * BITMAPINFOHEADER convention. Layout: RIFF(AVI hdrl(avih
    * strl(strh strf)) movi(frames) idx1). */
  def build(width: Int, biHeight: Int, handler: Int, biCompression: Int,
      frames: Seq[Array[Byte]], chunkId: String = "00db"): Array[Byte] = {
    val height = math.abs(biHeight)
    def even(n: Int) = n + (n & 1) // RIFF chunks are word-aligned
    val moviData = frames.map(f => 8 + even(f.length)).sum
    val hdrlSize = 4 + 8 + 56 + (8 + 4 + 8 + 56 + 8 + 40) // avih + strl
    val moviSize = 4 + moviData
    val idxSize = 16 * frames.length
    val total = 12 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(RIFF).putInt(total - 8).putInt(AVI)
    // hdrl LIST
    buf.putInt(LIST).putInt(hdrlSize).putInt(HDRL)
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    buf.putInt(AVIH).putInt(56)
      .putInt(100000)                  // dwMicroSecPerFrame (10 fps)
      .putInt(maxFrame * 10)           // dwMaxBytesPerSec
      .putInt(0)                       // dwPaddingGranularity
      .putInt(0x10)                    // dwFlags: AVIF_HASINDEX
      .putInt(frames.length)           // dwTotalFrames
      .putInt(0)                       // dwInitialFrames
      .putInt(1)                       // dwStreams
      .putInt(maxFrame)                // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // strl LIST: stream header + format
    buf.putInt(LIST).putInt(4 + 8 + 56 + 8 + 40).putInt(STRL)
    buf.putInt(STRH).putInt(56)
      .putInt(VIDS).putInt(handler)
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0)                         // dwInitialFrames
      .putInt(1).putInt(10)              // dwScale / dwRate = 10 fps
      .putInt(0).putInt(frames.length)   // dwStart, dwLength
      .putInt(maxFrame)                  // dwSuggestedBufferSize
      .putInt(-1)                        // dwQuality (default)
      .putInt(0)                         // dwSampleSize
      .putShort(0).putShort(0)           // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    buf.putInt(STRF).putInt(40)
      .putInt(40)                        // biSize
      .putInt(width).putInt(biHeight)
      .putShort(1).putShort(24)          // biPlanes, biBitCount
      .putInt(biCompression)
      .putInt(((width * 3 + 3) & ~3) * height) // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0) // ppm, colors
    // movi LIST
    buf.putInt(LIST).putInt(moviSize).putInt(MOVI)
    val ckid = fcc(chunkId)
    val offsets = new Array[Int](frames.length)
    // idx1 offsets are relative to the 'movi' fourcc (first chunk = 4)
    val moviFccPos = buf.position() - 4
    var i = 0
    frames.foreach { f =>
      offsets(i) = buf.position() - moviFccPos
      buf.putInt(ckid).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      i += 1
    }
    // idx1
    buf.putInt(IDX1).putInt(idxSize)
    i = 0
    while (i < frames.length) {
      buf.putInt(ckid).putInt(0x10)      // AVIIF_KEYFRAME
        .putInt(offsets(i)).putInt(frames(i).length)
      i += 1
    }
    buf.array()
  }

  /** Closed-form frame pixels shared by the writer and the q89 oracle:
    * u(id,f,x,y) = (id·1099087573 + 769f + 37x + 101y) mod 256;
    * R = u, G = 255−u, B = (73·u) mod 256. */
  @inline private[multimodal] def pixel(id: Long, f: Int, x: Int, y: Int)
      : Int =
    ((id * 1099087573L + f * 769 + x * 37 + y * 101) & 0xff).toInt

  /** Raw bottom-up BI_RGB frame data (BGR byte order, rows padded to a
    * 4-byte boundary — the classic DIB stride). Channel mapping is the
    * shared (u, 255−u, 73u mod 256) of [[pixel]] — the same mapping as
    * the GIF palette, which is what makes cross-container twins
    * possible ([[syntheticGifTwinAviTable]]). */
  private def dibFrameWith(w: Int, h: Int)(px: (Int, Int) => Int)
      : Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up: last row first
      var x = 0
      while (x < w) {
        val u = px(x, y)
        out(row + x * 3) = ((u * 73) & 0xff).toByte     // B
        out(row + x * 3 + 1) = (255 - u).toByte         // G
        out(row + x * 3 + 2) = u.toByte                 // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def dibFrame(id: Long, f: Int, w: Int, h: Int): Array[Byte] =
    dibFrameWith(w, h)((x, y) => pixel(id, f, x, y))

  /** AVI/DIB twins of [[Multimodal.syntheticVideoTable]]'s GIFs: the
    * SAME frame count and the SAME decoded pixels — frame f pixel
    * (x,y) carries the GIF's palette index formula
    * k = (id·2654435761 + 977f + 31x + 131y) mod 256 through the
    * shared (k, 255−k, 73k) channel mapping — inside a genuine
    * RIFF/AVI container. A content fingerprint over DECODED frames
    * must merge each twin with its GIF; any byte/container-level
    * fingerprint can not. */
  def syntheticGifTwinAviTable(docs: DataFrame, idShift: Long = 0L)
      : Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    Multimodal.idScan(docs).mapPartitions { ids =>
      ids.map { id0 =>
        val nf = (id0 % 5 + 2).toInt
        val frames = (0 until nf).map { f =>
          dibFrameWith(8, 8) { (x, y) =>
            ((id0 * 2654435761L + f * 977 + x * 31 + y * 131) & 0xff).toInt
          }
        }
        MediaRow(id0 + idShift, build(8, 8, DIB, 0, frames),
          MediaMeta("video", 8, 8, nf, 0, "video/x-msvideo"))
      }
    }
  }

  /** Synthetic table of REAL AVI videos: (id mod 4)+2 uncompressed
    * 6×6 BI_RGB frames per container (width 6 ⇒ an 18-byte pixel row
    * padded to a 20-byte stride, so the gate exercises DIB padding).
    * Everything about the file is genuine AVI — RIFF framing, avih/
    * strh/strf headers, movi chunks, idx1 — and BI_RGB is lossless,
    * so [[decodeAviFrames]]' output is analytically recomputable. */
  def syntheticAviTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    Multimodal.idScan(docs).mapPartitions { ids =>
      ids.map { id =>
        val nf = (id % 4 + 2).toInt
        val frames = (0 until nf).map(f => dibFrame(id, f, 6, 6))
        MediaRow(id, build(6, 6, DIB, 0, frames),
          MediaMeta("video", 6, 6, nf, 0, "video/x-msvideo"))
      }
    }
  }

  /** Synthetic table of REAL MJPG AVI videos: (id mod 3)+2 frames of
    * 16×16 pixels, each frame a genuine baseline JPEG from
    * [[Jpeg.encodeConstantBlocks]] — constant 8×8 blocks, flat quant
    * table, so the lossy-in-general codec is EXACT here and the
    * decode is analytically recomputable: block (bx,by) of frame f
    * decodes to 64 gray pixels of exactly
    * u = [[pixel]](id, f, bx, by), R=G=B=u. The container walk, the
    * '00dc' chunk suffix, and ImageIO's real JPEG entropy/IDCT path
    * all sit on the gate. */
  def syntheticMjpegTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    Multimodal.idScan(docs).mapPartitions { ids =>
      ids.map { id =>
        val nf = (id % 3 + 2).toInt
        val frames = (0 until nf).map { f =>
          Jpeg.encodeConstantBlocks(
            Array.tabulate(2, 2)((by, bx) => pixel(id, f, bx, by)))
        }
        MediaRow(id, build(16, 16, MJPG, MJPG, frames, chunkId = "00dc"),
          MediaMeta("video", 16, 16, nf, 0, "video/x-msvideo"))
      }
    }
  }

  private final class Bih(val width: Int, val biHeight: Int,
      val bitCount: Int, val compression: Int)

  /** Walk one AVI payload: returns (format, frame chunk [start,len)
    * offsets in movi order). Truncated payloads yield the frames that
    * fit — a short read is fewer rows, not an exception (matching
    * [[Multimodal.decodeVideoFrames]]' container-driven row set). */
  private def parse(payload: Array[Byte]): (Option[Bih], Seq[(Int, Int)]) = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (buf.remaining < 12 || buf.getInt(0) != RIFF || buf.getInt(8) != AVI)
      return (None, Nil)
    var bih: Option[Bih] = None
    val frames = Seq.newBuilder[(Int, Int)]
    // Chunk walk over absolute offsets; LISTs we care about
    // (hdrl/strl/movi/rec ) are descended into, others skipped whole.
    def walk(start: Int, end: Int): Unit = {
      var p = start
      val avail = math.min(end, payload.length)
      while (p + 8 <= avail) {
        val id = buf.getInt(p); val size = buf.getInt(p + 4)
        if (size < 0) return
        val body = p + 8
        if (id == LIST && body + 4 <= avail) {
          val listType = buf.getInt(body)
          if (listType == HDRL || listType == STRL || listType == MOVI ||
              listType == REC)
            walk(body + 4, math.min(body + size, avail))
        } else if (id == STRF && bih.isEmpty && body + 20 <= avail) {
          // First stream format wins (single-video-stream containers);
          // a fuller reader would pair strh/strf per stream.
          bih = Some(new Bih(buf.getInt(body + 4), buf.getInt(body + 8),
            buf.getShort(body + 14).toInt, buf.getInt(body + 16)))
        } else if (((id >>> 16) == SufDb || (id >>> 16) == SufDc)
            && body + size <= avail) {
          // a whole '##db'/'##dc' frame chunk, any stream number
          frames += ((body, size))
        }
        p = body + size + (size & 1)
      }
    }
    walk(12, payload.length)
    (bih, frames.result())
  }

  /** REAL AVI frame decode + sampling: RIFF-walk the container, keep
    * every `stride`-th movi frame chunk, decode it (BI_RGB raw rows or
    * MJPG via ImageIO's JPEG codec) and emit one row per sampled frame
    * with decoded dimensions and per-channel pixel sums — the same
    * [[FrameRow]] contract as the GIF path, so downstream operators
    * are container-agnostic. Non-video rows and unparseable payloads
    * are skipped; truncated containers yield the frames that fit. */
  def decodeAviFrames(media: Dataset[MediaRow], stride: Int)
      : Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { rows =>
      ensureCodecInit()
      rows.flatMap { r =>
        if (r.meta.kind != "video") Iterator.empty
        else frames(r.media_id, r.payload, stride)
      }
    }
  }

  /** Per-row AVI frame decode (shared by [[decodeAviFrames]] and the
    * container-agnostic [[Multimodal.decodeFrames]] dispatcher). */
  private[multimodal] def frames(id: Long, payload: Array[Byte],
      stride: Int): Iterator[FrameRow] = {
    val (bihOpt, chunks) = parse(payload)
    bihOpt match {
      case None => Iterator.empty
      case Some(bih) =>
        (0 until chunks.length by stride).iterator.map { f =>
          val (off, len) = chunks(f)
          if (bih.compression == 0 && bih.bitCount == 24)
            decodeDib(id, f, payload, off, len, bih)
          else
            decodeJpegChunk(id, f, payload, off, len)
        }
    }
  }

  private def decodeDib(id: Long, f: Int, payload: Array[Byte],
      off: Int, len: Int, bih: Bih): FrameRow = {
    val w = bih.width; val h = math.abs(bih.biHeight)
    val rowStride = (w * 3 + 3) & ~3
    // Clamp both loops to the data actually present in the chunk: a
    // corrupt header (50000×50000 over a 1 KB chunk) must degrade to
    // fewer rows like every other parse failure, not spin w·h guarded
    // iterations per frame. The per-byte guard below stays the exact
    // arbiter; the clamps only bound iteration counts. The channel
    // sums are order-independent, so iterating source rows directly
    // needs no bottom-up/top-down special casing.
    val hEff = if (rowStride <= 0) 0
      else math.min(h.toLong, (len.toLong + rowStride - 1) / rowStride)
        .toInt
    val wEff = math.min(w.toLong, (len.toLong + 2) / 3).toInt
    var rs = 0L; var gs = 0L; var bs = 0L
    var srcRow = 0
    while (srcRow < hEff) {
      val base = off + srcRow * rowStride
      var x = 0
      while (x < wEff) {
        val p = base + x * 3
        if (p + 2 < off + len) {
          bs += payload(p) & 0xff
          gs += payload(p + 1) & 0xff
          rs += payload(p + 2) & 0xff
        }
        x += 1
      }
      srcRow += 1
    }
    FrameRow(id, f, w, h, rs, gs, bs)
  }

  private def decodeJpegChunk(id: Long, f: Int, payload: Array[Byte],
      off: Int, len: Int): FrameRow = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload, off, len))
    if (img == null) FrameRow(id, f, 0, 0, 0L, 0L, 0L)
    else {
      val w = img.getWidth; val h = img.getHeight
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
          x += 1
        }
        y += 1
      }
      FrameRow(id, f, w, h, rs, gs, bs)
    }
  }

  /** Build an MJPG AVI from BufferedImages (each frame ImageIO-encoded
    * as a baseline JPEG into a `00dc` chunk) — the lossy-codec path,
    * spec-gated against per-chunk ImageIO decode. */
  def buildMjpeg(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    ensureCodecInit()
    val encoded = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (w, h) =
      if (frames.isEmpty) (0, 0) else (frames.head.getWidth, frames.head.getHeight)
    build(w, h, MJPG, MJPG, encoded, chunkId = "00dc")
  }
}
