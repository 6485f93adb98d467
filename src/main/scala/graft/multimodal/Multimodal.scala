package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / resize /
  * frame-sample stages shaped for large-scale pipelines.
  *
  * The Spark-side plumbing here is REAL — schemas, partition-batched
  * execution (`mapPartitions` over an iterator, the JVM analogue of
  * arrow-batched mapInPandas), feature schema `array<float>` compatible
  * with the similarity operators. The codec itself is a STUB: this
  * container has no image/audio libraries, so `decodeStub` derives a
  * deterministic fake feature vector from the payload bytes. Swapping in
  * a real codec changes only the function body marked FAKE-DECODE below;
  * every schema, boundary, and test stays.
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

  /** Decode + feature-extract, partition-batched. Real pipeline shape;
    * FAKE-DECODE body. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition setup (a real codec would init native handles /
      // model weights here, once per partition — the batch-shape win).
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
          fakeDecode(r.payload, dim))
      }
    }
  }

  /** FAKE-DECODE: deterministic stand-in for image/audio decoding — a
    * byte-histogram-ish projection of the payload into `dim` floats.
    * Replace with a real codec (e.g. decode → pooled embedding) without
    * touching any caller. */
  private[multimodal] def fakeDecode(payload: Array[Byte], dim: Int)
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
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
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

  /** REAL image decode + feature extraction: ImageIO-decode the PNG and
    * emit [width, height, mean R, mean G, mean B, 11-bin gray histogram]
    * (dim 16). Partition-batched like decodeFeatures; this is the
    * un-stubbed path — audio/video remain behind fakeDecode until their
    * codecs exist in the environment. */
  def decodeImageFeatures(media: Dataset[MediaRow])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
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

  /** Resize stage (images/video frames): metadata transform is real;
    * pixel work is the same FAKE-DECODE boundary. At scale this is a
    * pure map — no shuffle, no driver involvement. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // FAKE-DECODE: a real implementation re-encodes pixels; the
        // deterministic stand-in keeps payload bytes and updates meta.
        r.copy(meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame sampling (video): keep every `stride`-th frame index. Emits
    * one row per sampled frame — the explode-shaped stage a real video
    * pipeline needs (partitioning carries, no shuffle). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.toDF.select(col("media_id"), col("meta.kind").as("kind"),
        explode(sequence(lit(0),
          greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
      .filter(col("kind") === "video")
  }
}
