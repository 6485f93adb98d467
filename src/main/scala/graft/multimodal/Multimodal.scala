package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages shaped for large-scale pipelines.
  *
  * The Spark-side plumbing is REAL — schemas, partition-batched
  * execution (`mapPartitions` over an iterator, the JVM analogue of
  * arrow-batched mapInPandas), feature schema `array<float>` compatible
  * with the similarity operators. Codecs: IMAGE decode and resize are
  * real (JDK ImageIO), AUDIO decode is real (javax.sound WAV, with a
  * raw-PCM fallback), VIDEO frame decode is real for two containers:
  * animated GIF (ImageIO's multi-frame reader; see
  * [[decodeVideoFrames]]) and AVI/RIFF (hand-walked chunk parser with
  * uncompressed-DIB and MJPG codecs; see [[Avi]]). Containers with
  * no in-environment codec (MP4/H.264 — no ffmpeg on the classpath and
  * no egress to fetch one) get the honest byte-level fingerprint of
  * [[byteFeatures]] rather than a pretend decode.
  *
  * Scale notes: decode is per-row CPU-bound work with no shuffle — it
  * pipelines inside the scan stage and parallelizes with input splits.
  * Feature vectors go straight into Similarity/Dedup operators (both
  * operate on array<float> columns) without materializing intermediates.
  */
object Multimodal {

  /** Typed metadata carried alongside an opaque payload. */
  case class MediaMeta(
      kind: String,       // image | audio | video
      width: Int,         // pixels (image/video) or 0
      height: Int,
      n_frames: Int,      // video frames / audio windows, 1 for images
      sample_rate: Int,   // Hz for audio, 0 otherwise
      content_type: String)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** One-time per-executor-JVM ImageIO configuration. The JDK defaults
    * `ImageIO.setUseCache(true)`, which backs EVERY
    * read/write/createImage{Input,Output}Stream with a disk temp file —
    * at one encode plus one decode per row that is two temp-file
    * create/delete syscall pairs per record, and it dominated q87's
    * cost (and leaked tmp churn). In-memory payloads never need disk
    * spill; referencing this object inside a mapPartitions closure runs
    * the init exactly once per executor classloader. */
  private object CodecInit {
    javax.imageio.ImageIO.setUseCache(false)
  }
  @inline private[multimodal] def ensureCodecInit(): Unit = CodecInit

  /** Audio SPI providers resolved ONCE per executor JVM (r18 "not yet"
    * item, guide §1.2 per-task work): AudioSystem.getAudioInputStream /
    * AudioSystem.write go through a SYNCHRONIZED static provider lookup
    * per call — at one write plus one read per clip, 32 decode threads
    * serialize on that lock. The codecs used are the same JDK provider
    * instances the AudioSystem path dispatches to, obtained through the
    * standard public SPI (ServiceLoader); only the discovery is
    * amortized. Provider ORDER cannot change results here: exactly one
    * provider accepts a given container (the rest throw
    * UnsupportedAudioFileException and reset the stream, per the SPI
    * contract), and exactly one writes WAVE. */
  private lazy val audioReaders
      : Array[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toArray
  }
  private lazy val wavWriters
      : Array[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .filter(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .toArray
  }

  /** AudioSystem.getAudioInputStream through the cached provider list —
    * same first-success/throw semantics (each failing reader resets the
    * mark-supporting ByteArrayInputStream, the SPI contract). */
  private def openAudio(payload: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val in = new java.io.ByteArrayInputStream(payload)
    var i = 0
    while (i < audioReaders.length) {
      try return audioReaders(i).getAudioInputStream(in)
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no cached provider accepts this payload")
  }

  /** AudioSystem.write(…, WAVE, …) through the cached writer. */
  private def writeWav(ais: javax.sound.sampled.AudioInputStream,
      out: java.io.OutputStream): Unit = {
    require(wavWriters.nonEmpty, "no WAVE AudioFileWriter provider")
    wavWriters(0).write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
  }

  /** Decode fan-out for the synthetic media generators: the id scan is
    * 8 bytes/row and often ONE file split (an 80 MB parquet at sf1 is
    * a single 128 MB-bound partition), while the downstream codec work
    * is CPU-bound — without an explicit repartition the whole encode/
    * decode chain runs on one core and wall time scales with ROWS, not
    * rows/cores (the r10 scale gate caught exactly that on q58).
    * Shuffling longs to the session's full parallelism costs ~nothing
    * and mirrors the real-pipeline shape: hash the path/id list across
    * the cluster BEFORE fetching and decoding payloads. */
  private[multimodal] def idScan(docs: DataFrame)
      : Dataset[Long] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
  }

  case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, features: Array[Float])

  /** Build a deterministic synthetic media table from the `documents`
    * fixture (payload = UTF-8 bytes of the text; kind/dimensions derived
    * from doc_id) — stands in for a real binary source like image dirs
    * or tar shards. */
  def syntheticMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        when(col("doc_id") % 3 === 0, lit(640)).otherwise(lit(0))
          .cast("int").as("width"),
        when(col("doc_id") % 3 === 0, lit(480)).otherwise(lit(0))
          .cast("int").as("height"),
        when(col("doc_id") % 3 === 2, (col("doc_id") % 100 + 1).cast("int"))
          .otherwise(lit(1)).as("n_frames"),
        when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(0))
          .cast("int").as("sample_rate"),
        element_at(lit(Array("image/png", "audio/wav", "video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("content_type"))
        .as("meta"))

  /** Content-type-agnostic BYTE-LEVEL features, partition-batched: a
    * normalized byte histogram projected into `dim` floats. This is NOT
    * a codec and does not pretend to be one — it is the honest
    * container-level fingerprint (magic-byte distribution, entropy
    * proxy) a pipeline computes for payloads it cannot decode. Image
    * and audio have real codecs (decodeImageFeatures /
    * decodeAudioFeatures); VIDEO has no codec in this environment (no
    * ffmpeg/javacv on the classpath and no egress to fetch one), so
    * video payloads get exactly this byte-level treatment — documented
    * here and in SURVEY.md, not hidden behind a fake decode. */
  def byteFeatures(media: Dataset[MediaRow], dim: Int = 16)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup (a real codec would init native handles /
      // model weights here, once per partition — the batch-shape win).
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
          byteHistogram(r.payload, dim))
      }
    }
  }

  /** Kind-dispatched decode — the single feature-extraction entry a
    * mixed media table (or micro-batch) goes through: REAL codecs
    * where this environment has them (image → [[decodeImageFeatures]],
    * audio → [[decodeAudioFeatures]]), the honest byte-level
    * fingerprint ([[byteFeatures]]) for everything else (video — see
    * the byteFeatures note). Shared by the batch gates and the
    * streaming twin ([[graft.streaming.Streams.startMediaDecode]]) so
    * stream == batch parity is a property of ONE dispatch, not two
    * implementations kept in sync by hand. Stateless per row: three
    * partition-batched codec scans, no shuffle. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeImageFeatures(media.filter(_.meta.kind == "image"))
      .unionAll(decodeAudioFeatures(media.filter(_.meta.kind == "audio")))
      .unionAll(byteFeatures(media.filter(r =>
        r.meta.kind != "image" && r.meta.kind != "audio")))

  /** Normalized byte histogram (see byteFeatures). */
  private[multimodal] def byteHistogram(payload: Array[Byte], dim: Int)
      : Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(java.lang.Math.floorMod(payload(i).toInt, dim)) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < dim) { acc(j) /= n; j += 1 }
    acc
  }

  /** Synthetic table of REAL images: deterministic 8×8 PNGs (pixels
    * derived from media_id) encoded with the JDK's ImageIO — so the
    * decode stage below exercises an actual codec end-to-end, not a
    * stand-in. */
  def syntheticImageTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    idScan(docs).mapPartitions { ids =>
      ensureCodecInit()
      ids.map { id =>
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            // deterministic pixel pattern per id
            val v = (id * 2654435761L + x * 31 + y * 131) & 0xffffff
            img.setRGB(x, y, v.toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, bos.toByteArray,
          MediaMeta("image", 8, 8, 1, 0, "image/png"))
      }
    }
  }

  /** Scrambled variant of [[syntheticImageTable]] for the image
    * near-dup gate (q100): per-pixel values go through a second
    * multiply-and-mask mix keyed by the pixel index, so two DIFFERENT
    * doc ids share no pixel structure (the plain table's shared
    * x·31+y·131 gradient makes aHashes collide corpus-wide — fine for
    * decode gates, degenerate for a near-dup join). Every intermediate
    * is masked to 24 bits BEFORE the next multiply, keeping the whole
    * formula inside exact int64 in Spark and DuckDB alike.
    * `pixel0Delta` perturbs pixel (0,0) AFTER the mix — a small
    * edit whose decoded near-dup distance stays small. */
  def scrambledImageTable(docs: DataFrame, idShift: Long = 0L,
      pixel0Delta: Long = 0L): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    idScan(docs).mapPartitions { ids =>
      ensureCodecInit()
      ids.map { id0 =>
        val h1 = (id0 * 2654435761L) & 0xffffff
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val idx = y * 8 + x
            val mixed = ((h1 + idx) * 2654435761L) & 0xffffff
            val d = if (idx == 0) pixel0Delta else 0L
            val v = (mixed + d) & 0xffffff
            img.setRGB(x, y, v.toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id0 + idShift, bos.toByteArray,
          MediaMeta("image", 8, 8, 1, 0, "image/png"))
      }
    }
  }

  /** REAL image decode + feature extraction: ImageIO-decode the PNG and
    * emit [width, height, mean R, mean G, mean B, 11-bin gray histogram]
    * (dim 16). Partition-batched like byteFeatures; real-codec path
    * (audio has its own in decodeAudioFeatures). */
  def decodeImageFeatures(media: Dataset[MediaRow])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ensureCodecInit()
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable payload for ${r.media_id}")
        val w = img.getWidth; val h = img.getHeight
        val feats = new Array[Float](16)
        feats(0) = w.toFloat; feats(1) = h.toFloat
        val hist = new Array[Float](11)
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val rr = (p >> 16) & 0xff; val gg = (p >> 8) & 0xff
            val bb = p & 0xff
            rs += rr; gs += gg; bs += bb
            hist(((rr + gg + bb) / 3) * 11 / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w * h).toFloat
        feats(2) = rs / n; feats(3) = gs / n; feats(4) = bs / n
        var i = 0
        while (i < 11) { feats(5 + i) = hist(i) / n; i += 1 }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
          feats)
      }
    }
  }

  /** Perceptual average-hash (aHash) over REAL decoded pixels — the
    * standard first-pass image near-dup signal in training-data
    * pipelines: bit i is set iff pixel i's gray value is above the
    * image mean, so re-encodes, metadata changes and slight noise
    * produce hashes within small hamming distance while distinct
    * images are ~random 64-bit values. Emitted as two 32-bit halves
    * (`ahash_lo` bits 0–31 row-major, `ahash_hi` bits 32–63) — no
    * 1<<63 sign-bit arithmetic anywhere, which keeps the value
    * portable across engines — plus `n_bright`, the popcount. All
    * integer arithmetic: gray = r+g+b (no /3 — monotone-equivalent)
    * and the bit test is gray·(w·h) > Σgray, exact in 64-bit. Exact
    * dups group on (ahash_lo, ahash_hi); near-dups compose with the
    * SimHash pigeonhole band join (Dedup) over the same bits.
    * Partition-batched decode, no shuffle — at 100 TB this is one
    * codegen-adjacent scan stage. Full-size images are bilinear-rescaled
    * to 8×8 IN the hash (the standard aHash pipeline — same kernel as
    * [[resize]], without the PNG re-encode round trip), so every input
    * size packs exactly 64 bits; images already 8×8 skip the rescale
    * and hash their pixels untouched. */
  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ensureCodecInit()
      rows.filter(_.meta.kind == "image").map { r =>
        val decoded = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(decoded != null, s"undecodable payload for ${r.media_id}")
        val img =
          if (decoded.getWidth == 8 && decoded.getHeight == 8) decoded
          else {
            val out = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(decoded, 0, 0, 8, 8, null)
            } finally g.dispose()
            out
          }
        val w = img.getWidth; val h = img.getHeight
        val n = w * h
        val gray = new Array[Long](n)
        var total = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            gray(y * w + x) = g.toLong
            total += g
            x += 1
          }
          y += 1
        }
        var lo = 0L; var hi = 0L; var nb = 0L
        var i = 0
        while (i < n) {
          if (gray(i) * n > total) {
            nb += 1
            if (i < 32) lo |= 1L << i
            else if (i < 64) hi |= 1L << (i - 32)
          }
          i += 1
        }
        (r.media_id, lo, hi, nb)
      }
    }.toDF("media_id", "ahash_lo", "ahash_hi", "n_bright")
  }

  /** Synthetic table of REAL audio: deterministic 0.1s 16-bit mono PCM
    * WAV clips (SQUARE waves — frequency and amplitude derived from
    * media_id) written with the JDK's javax.sound.sampled, so audio
    * decode below exercises an actual codec. Square, not sine, on
    * purpose: every sample is ±amplitude by INTEGER arithmetic (the
    * sign is the parity of (freq·i) / halfRate), so the decoded RMS is
    * exactly the amplitude and the zero-crossing count has the closed
    * form (freq·(n−1)) / halfRate — no libm sin() whose last ulp
    * differs between engines. That is what lets the q58 gate be
    * DuckDB-oracle-exact while the decode stays a real JDK codec
    * (the q33/q34 rebase trick applied to a codec). */
  def syntheticAudioTable(docs: DataFrame, idShift: Long = 0L,
      ampShift: Int = 0): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    idScan(docs).mapPartitions { ids =>
      ids.map { id0 =>
        val id = id0 + idShift
        val rate = 8000
        val n = rate / 10 // 0.1 s
        // tone parameters key off the UNSHIFTED doc id, so an
        // idShift/ampShift twin is the same tone at a different volume
        // — the pair an amplitude-invariant fingerprint must merge
        val freq = 200 + (id0 % 40).toInt * 20 // integer Hz < rate/2
        val amp = 6000 + (id0 % 10).toInt * 600 + ampShift
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          // halfRate = 4000 sample-halves per second: the square wave
          // flips sign each time (freq*i)/4000 crosses an integer
          val v = if (((freq.toLong * i) / 4000) % 2 == 0) amp else -amp
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
          true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writeWav(ais, bos) // cached SPI writer — same JDK WAVE codec
        MediaRow(id, bos.toByteArray,
          MediaMeta("audio", 0, 0, n, rate, "audio/wav"))
      }
    }
  }

  /** Perceptual AUDIO fingerprint: decode the WAV (same container +
    * raw-PCM fallback as [[decodeAudioFeatures]]) and pack the SIGNS of
    * 64 evenly strided samples into two 32-bit halves (the engine-
    * portable packing of [[imageAHash]]). Sign patterns capture the
    * tone/periodicity and are invariant to volume — the same clip at a
    * different amplitude fingerprints identically, which is what makes
    * this a dedup key rather than a byte hash. Compose downstream with
    * [[graft.operators.Dedup.exactGroups]] (identical tones) or
    * [[graft.operators.Dedup.hammingHalvesPairs]] (near-matches).
    * Partition-batched scan, no shuffle. */
  def audioSignHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.meta.kind == "audio").map { r =>
        val bytes =
          try openAudio(r.payload).readAllBytes()
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              r.payload // raw PCM fallback
          }
        val n = bytes.length / 2
        val stride = math.max(1, n / 64)
        var lo = 0L; var hi = 0L
        var j = 0
        while (j < 64) {
          val i = j * stride
          if (i < n) {
            val v = ((bytes(2 * i + 1).toInt << 8) |
              (bytes(2 * i) & 0xff)).toShort.toInt
            if (v >= 0) {
              if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
            }
          }
          j += 1
        }
        (r.media_id, lo, hi)
      }
    }.toDF("media_id", "sig_lo", "sig_hi")
  }

  /** REAL audio decode + feature extraction: parse the WAV container
    * with AudioSystem, then emit [n_samples, sample_rate, RMS,
    * zero-crossing rate, 12-bin amplitude histogram] (dim 16).
    * Container-less payloads (no RIFF header — raw PCM dumps are common
    * in scraped corpora) fall back to interpreting the bytes as 16-bit
    * little-endian mono PCM at the row's metadata sample rate, so one
    * headerless clip doesn't fail the whole partition. */
  def decodeAudioFeatures(media: Dataset[MediaRow])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (bytes, rate) =
          try {
            val ais = openAudio(r.payload)
            (ais.readAllBytes(), ais.getFormat.getSampleRate)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              (r.payload, r.meta.sample_rate.toFloat) // raw PCM fallback
          }
        val n = bytes.length / 2
        val feats = new Array[Float](16)
        feats(0) = n.toFloat
        feats(1) = rate
        var sumSq = 0.0; var crossings = 0; var prev = 0
        val hist = new Array[Float](12)
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i + 1).toInt << 8) |
            (bytes(2 * i) & 0xff)).toShort.toInt
          sumSq += v.toDouble * v
          if (i > 0 && ((v >= 0) != (prev >= 0))) crossings += 1
          hist(math.min(11, math.abs(v) * 12 / 32768)) += 1f
          prev = v
          i += 1
        }
        feats(2) = math.sqrt(sumSq / math.max(1, n)).toFloat
        feats(3) = crossings.toFloat / math.max(1, n)
        var j = 0
        while (j < 12) { feats(4 + j) = hist(j) / math.max(1, n); j += 1 }
        MediaFeatures(r.media_id, "audio", r.payload.length.toLong, feats)
      }
    }
  }

  /** REAL resize stage for image payloads: ImageIO-decode, bilinear
    * Graphics2D rescale to (w, h), PNG re-encode — pixels change, and
    * the payload's decoded dimensions equal the new metadata (asserted
    * in MultimodalSpec). Non-image rows pass through UNTOUCHED,
    * metadata included — resize is an image-stage operator and must not
    * lie about payloads it cannot transform (video: no codec in this
    * environment, see byteFeatures). At scale this is a pure map — no
    * shuffle, no driver involvement. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ensureCodecInit()
      rows.map { r =>
        if (r.meta.kind != "image") r
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable image payload ${r.media_id}")
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRow(r.media_id, bos.toByteArray,
            r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Frame sampling by METADATA (no decode): keep every `stride`-th
    * frame index. Emits one row per sampled frame — the explode-shaped
    * stage a real video pipeline needs (partitioning carries, no
    * shuffle). For sampling that decodes the real frames out of a real
    * container, see [[decodeVideoFrames]]. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.toDF().select(col("media_id"), col("meta.kind").as("kind"),
        explode(sequence(lit(0),
          greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
      .filter(col("kind") === "video")
  }

  /** One decoded, sampled video frame: dimensions + per-channel pixel
    * sums (the integer-exact per-frame statistics the q87 gate pins). */
  case class FrameRow(media_id: Long, frame_idx: Int, frame_w: Int,
      frame_h: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Closed-form 256-entry palette shared by the GIF writer and the
    * analytic oracle: R(i)=i, G(i)=255−i, B(i)=(73·i) mod 256. GIF is
    * LOSSLESS for ≤256 colors, so every decoded pixel is exactly the
    * palette entry of its stored index — that is what lets a real
    * multi-frame codec roundtrip stay DuckDB-oracle-exact (the q53/q58
    * trick applied to a video container). */
  private[multimodal] def gifPalette
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      r(i) = i.toByte; g(i) = (255 - i).toByte; b(i) = ((i * 73) & 0xff).toByte
      i += 1
    }
    (r, g, b)
  }

  /** Synthetic table of REAL videos: deterministic multi-frame animated
    * GIFs ((id mod 5)+2 frames of 8×8 indexed pixels, frame f pixel
    * (x,y) = palette index (id·2654435761 + 977f + 31x + 131y) mod 256)
    * written with ImageIO's sequence writer — a genuine video container
    * (GIF89a, per-frame image descriptors, LZW-coded frames) that
    * [[decodeVideoFrames]] walks with a genuine multi-frame codec. */
  def syntheticVideoTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    idScan(docs).mapPartitions { ids =>
      ensureCodecInit()
      // Palette, color model, writer and a reusable frame buffer built
      // once per partition (codec-handle reuse — the partition-batch
      // win; the per-row registry lookup alone was measurable at 5k
      // rows). setOutput resets the writer's sequence state per row.
      val (pr, pg, pb) = gifPalette
      val icm = new java.awt.image.IndexColorModel(8, 256, pr, pg, pb)
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      ids.map { id =>
        val nf = (id % 5 + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val ras = img.getRaster
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                ras.setSample(x, y, 0,
                  ((id * 2654435761L + f * 977 + x * 31 + y * 131) & 0xff)
                    .toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally ios.close() // writer is partition-shared, not disposed

        MediaRow(id, bos.toByteArray,
          MediaMeta("video", 8, 8, nf, 0, "image/gif"))
      }
    }
  }

  /** REAL video frame decode + sampling: walk the multi-frame container
    * with ImageIO's GIF reader, keep every `stride`-th frame, and emit
    * one row per sampled frame with decoded dimensions and per-channel
    * pixel sums. The frame count comes from the CONTAINER
    * (`getNumImages`), not the metadata — a truncated payload yields
    * fewer rows, as it should. Non-video rows are skipped (decode is a
    * video-stage operator). At scale this is a pure flatMap — per-row
    * CPU-bound codec work that pipelines inside the scan stage, no
    * shuffle, no driver involvement. */
  def decodeVideoFrames(media: Dataset[MediaRow], stride: Int)
      : Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { rows =>
      ensureCodecInit()
      // One reader per partition: setInput fully resets its state per
      // row, and the registry lookup is not free at corpus row counts.
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        if (r.meta.kind != "video") Iterator.empty
        else gifFrames(reader, r.media_id, r.payload, stride)
      }
    }
  }

  /** Per-video CONTENT fingerprint over decoded frames: md5 of the
    * ordered "w:h:sum_r:sum_g:sum_b" frame summaries. Keyed on what the
    * codec DECODED, not on payload bytes — so the same footage stored
    * in different containers (GIF vs AVI), or re-encoded losslessly,
    * fingerprints identically, while any container-level hash splits
    * them. md5-of-strings is engine-portable (the q78 rule), so the
    * whole dedup runs under a SQL oracle. One hash agg keyed by
    * media_id; compose with [[graft.operators.Dedup.exactGroups]]. */
  def videoContentFingerprint(frames: Dataset[FrameRow]): DataFrame =
    frames.toDF().groupBy(col("media_id"))
      .agg(
        md5(array_join(transform(
          array_sort(collect_list(struct(
            col("frame_idx").as("i"),
            concat_ws(":", col("frame_w"), col("frame_h"),
              col("sum_r"), col("sum_g"), col("sum_b")).as("s")))),
          x => x.getField("s")), ";")).as("fingerprint"),
        count(lit(1)).as("n_frames"))

  /** Shot-boundary (scene-cut) detection over decoded frames — the
    * standard cheap first tier of a video-curation pipeline (segment
    * footage at cuts before sampling clips for training): a frame
    * starts a new shot when its per-channel pixel-sum L1 delta against
    * the PREVIOUS decoded frame exceeds `minDelta`. Channel-sum deltas
    * are the classic fast detector (a global-histogram difference in
    * its coarsest form); exact integer arithmetic end to end, so the
    * decision column gates under a SQL oracle while Spark derives the
    * sums from real codec output.
    *
    * Scale shape: one window keyed by media_id ordered by frame_idx —
    * partitions are VIDEO-sized (a few thousand frames), never
    * corpus-sized, and the decode upstream is a pure flatMap, so the
    * only shuffle is the per-video repartition the window needs.
    * Frame 0 has no predecessor and is not a transition row. */
  def sceneCuts(frames: Dataset[FrameRow], minDelta: Long): DataFrame = {
    require(minDelta >= 0, s"minDelta must be >= 0, got $minDelta")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames.toDF()
      .withColumn("__delta",
        abs(col("sum_r") - lag(col("sum_r"), 1).over(w)) +
        abs(col("sum_g") - lag(col("sum_g"), 1).over(w)) +
        abs(col("sum_b") - lag(col("sum_b"), 1).over(w)))
      .filter(col("__delta").isNotNull)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("__delta").as("delta"),
        (col("__delta") > minDelta).as("is_cut"))
  }

  /** Per-row GIF frame decode against a partition-shared reader. */
  private def gifFrames(reader: javax.imageio.ImageReader, id: Long,
      payload: Array[Byte], stride: Int): Seq[FrameRow] = {
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload)))
    val n = reader.getNumImages(true)
    // Materialized eagerly: the rows must be produced while this
    // row's payload is still the reader's input.
    (0 until n by stride).map { f =>
      val img = reader.read(f)
      val w = img.getWidth; val h = img.getHeight
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff
          bs += p & 0xff
          x += 1
        }
        y += 1
      }
      FrameRow(id, f, w, h, rs, gs, bs)
    }
  }

  /** Container-AGNOSTIC frame decode: sniff each payload's magic bytes
    * and route to the matching real codec — `GIF8` → the ImageIO
    * multi-frame reader, `RIFF…AVI ` → the [[Avi]] chunk walker. Real
    * corpora mix containers within one binary column; this is the
    * operator a pipeline actually calls, with the per-container decoders
    * remaining available for homogeneous tables. Unknown containers are
    * skipped (they belong to [[byteFeatures]]), not faked. One pass,
    * per-row dispatch, no shuffle. */
  def decodeFrames(media: Dataset[MediaRow], stride: Int)
      : Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions { rows =>
      ensureCodecInit()
      lazy val gifReader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val p = r.payload
        if (r.meta.kind != "video" || p.length < 12) Iterator.empty
        else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
          gifFrames(gifReader, r.media_id, p, stride).iterator
        else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
            p(3) == 'F' && p(8) == 'A' && p(9) == 'V' && p(10) == 'I')
          Avi.frames(r.media_id, p, stride)
        else Iterator.empty
      }
    }
  }
}
