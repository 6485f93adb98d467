package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMediaTable(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("media table schema: opaque binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType == BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("kind").dataType == StringType)
    assert(meta("n_frames").dataType == IntegerType)
    assert(media.select("meta.kind").distinct().count() == 3)
  }

  test("byteFeatures: stable schema, deterministic output, features " +
      "compose with the vector operators") {
    val feats = Multimodal.byteFeatures(
      media.as[Multimodal.MediaRow], dim = 16)
    assert(feats.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val a = feats.orderBy("media_id").limit(5).collect()
    val b = Multimodal.byteFeatures(
      media.as[Multimodal.MediaRow], dim = 16)
      .orderBy("media_id").limit(5).collect()
    assert(a.zip(b).forall { case (x, y) =>
      x.features.sameElements(y.features) }) // deterministic byte features
    assert(a.forall(_.features.length == 16))
    assert(a.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3)) // normalized
    // features flow into the similarity operator unchanged
    val top = graft.operators.Similarity.topKForId(
      feats.toDF, "features", "media_id", queryId = 0, k = 3)
    assert(top.count() == 3)
  }

  test("real PNG roundtrip: ImageIO-decoded dimensions match metadata, " +
      "features deterministic and histogram-normalized") {
    val imgs = Multimodal.syntheticImageTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.decodeImageFeatures(imgs)
      .orderBy("media_id").limit(10).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features(0) == 8f && f.features(1) == 8f) // decoded w/h
      assert(math.abs(f.features.drop(5).sum - 1.0f) < 1e-3) // histogram
      assert(f.n_bytes > 50) // real PNG container bytes, not raw pixels
    }
    val again = Multimodal.decodeImageFeatures(imgs)
      .orderBy("media_id").limit(10).collect()
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) })
  }

  test("imageAHash: bits match an analytic recompute from the pixel " +
      "formula, popcount consistent, identical payloads hash equal") {
    val imgs = Multimodal.syntheticImageTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val rows = Multimodal.imageAHash(imgs)
      .orderBy("media_id").limit(8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      // recompute from the generator's pixel formula, bypassing the
      // codec entirely — agreement pins the PNG roundtrip bit-exact
      val gray = (for (y <- 0 until 8; x <- 0 until 8) yield {
        val v = (id * 2654435761L + x * 31 + y * 131) & 0xffffff
        ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
      }).toArray
      val total = gray.map(_.toLong).sum
      var lo = 0L; var hi = 0L
      for (i <- 0 until 64 if gray(i) * 64L > total)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      assert(r.getAs[Long]("ahash_lo") == lo, s"lo mismatch for $id")
      assert(r.getAs[Long]("ahash_hi") == hi, s"hi mismatch for $id")
      assert(r.getAs[Long]("n_bright") ==
        java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi))
    }
    // duplicate payloads (the dedup use case) hash identically
    val dup = imgs.limit(3)
    val h1 = Multimodal.imageAHash(dup).orderBy("media_id").collect()
    val h2 = Multimodal.imageAHash(dup).orderBy("media_id").collect()
    assert(h1.map(_.toSeq).toSeq == h2.map(_.toSeq).toSeq)
  }

  test("real WAV roundtrip: AudioSystem-decoded sample count and rate " +
      "match metadata; square-wave RMS and zero-crossing count are " +
      "EXACT (the integer arithmetic the q58 oracle recomputes)") {
    val clips = Multimodal.syntheticAudioTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.decodeAudioFeatures(clips)
      .orderBy("media_id").limit(10).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      val freq = 200 + (id % 40).toInt * 20
      val amp = 6000 + (id % 10).toInt * 600
      assert(f.features(0) == 800f)    // decoded samples = 0.1s @ 8kHz
      assert(f.features(1) == 8000f)   // decoded sample rate
      assert(f.features(2) == amp.toFloat,  // square RMS = amplitude
        s"id=$id rms=${f.features(2)} amp=$amp")
      val crossings = (freq.toLong * 799) / 4000 // closed form
      assert(math.round(f.features(3) * 800f) == crossings,
        s"id=$id zcr=${f.features(3)} expect $crossings/800")
      assert(f.n_bytes == 1644L) // 44-byte canonical header + 1600 PCM
    }
  }

  test("audioSignHash: volume-invariant (amp-shifted twin fingerprints " +
      "identical through REAL codec bytes that differ), tone-sensitive " +
      "(different freq differs), and matches the analytic sign bits") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val orig = Multimodal.syntheticAudioTable(docs)
    val loud = Multimodal.syntheticAudioTable(docs,
      idShift = 10000000L, ampShift = 900)
    // payload bytes genuinely differ (different amplitude)...
    val ob = orig.orderBy("media_id").head().payload
    val lb = loud.orderBy("media_id").head().payload
    assert(!java.util.Arrays.equals(ob, lb))
    // ...but sign fingerprints are identical per underlying doc
    val h = Multimodal.audioSignHash(orig.unionByName(loud))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("sig_lo"), r.getAs[Long]("sig_hi"))).toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      assert(h(id) == h(id + 10000000L), s"twin of $id split")
      // analytic recompute: bit j = ((freq * 12j) / 4000) % 2 == 0
      val freq = 200 + (id % 40) * 20
      var lo = 0L; var hi = 0L
      (0 until 64).foreach { j =>
        if ((freq * (j * 12L) / 4000) % 2 == 0) {
          if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
        }
      }
      assert(h(id) == (lo, hi), s"id=$id codec sign bits != formula")
    }
    // different tones (id%40 differs) fingerprint differently
    val f0 = h(0L); val f1 = h(1L)
    assert(f0 != f1)
  }

  test("cross-container video twins: the AVI/DIB twin decodes to the " +
      "GIF's exact frames through two different real codec paths, and " +
      "the content fingerprint merges them while the bytes differ") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val gif = Multimodal.syntheticVideoTable(docs)
    val avi = Avi.syntheticGifTwinAviTable(docs, idShift = 20000000L)
    // different containers entirely
    val gp = gif.orderBy("media_id").head().payload
    val ap = avi.orderBy("media_id").head().payload
    assert(new String(gp.take(4), "ascii").startsWith("GIF8"))
    assert(new String(ap.take(4), "ascii") == "RIFF")
    // frame-for-frame identical decoded content
    def rows(ds: org.apache.spark.sql.Dataset[Multimodal.MediaRow],
        shift: Long) =
      Multimodal.decodeFrames(ds, stride = 1).collect()
        .map(f => (f.media_id - shift, f.frame_idx) ->
          (f.frame_w, f.frame_h, f.sum_r, f.sum_g, f.sum_b)).toMap
    val g = rows(gif, 0L)
    val a = rows(avi, 20000000L)
    assert(g.nonEmpty && g == a)
    // fingerprints merge each twin pair
    val fp = Multimodal.videoContentFingerprint(
        Multimodal.decodeFrames(gif.unionByName(avi), stride = 1))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("fingerprint")).toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      assert(fp(id) == fp(id + 20000000L), s"twin of $id split")
    }
  }

  test("resize transforms pixels for real: the resized payload DECODES " +
      "to the target dimensions; non-image rows pass through untouched") {
    val imgs = Multimodal.syntheticImageTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val resized = Multimodal.resize(imgs, 24, 16)
    val sample = resized.orderBy("media_id").limit(5).collect()
    sample.foreach { r =>
      assert(r.meta.width == 24 && r.meta.height == 16)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 24 && img.getHeight == 16,
        s"payload decodes to ${img.getWidth}x${img.getHeight}")
    }
    // decoded content survives: resized image of a non-constant source
    // is itself non-constant (pixels were actually resampled, not synthesized)
    val px = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      sample.head.payload))
    val distinct = (for (x <- 0 until 24; y <- 0 until 16)
      yield px.getRGB(x, y)).distinct.size
    assert(distinct > 8)
    // non-image rows: payload AND metadata untouched (no metadata lies)
    val audioIn = media.as[Multimodal.MediaRow]
      .filter(_.meta.kind != "image")
    val audioOut = Multimodal.resize(audioIn, 224, 224)
      .orderBy("media_id").limit(5).collect()
    audioIn.orderBy("media_id").limit(5).collect().zip(audioOut)
      .foreach { case (i, o) =>
        assert(i.meta == o.meta && i.payload.sameElements(o.payload))
      }
  }

  test("headerless raw-PCM audio decodes via the fallback with features " +
      "matching the WAV-container path") {
    import spark.implicits._
    // one WAV clip and the same samples as a raw header-free PCM dump
    val rate = 8000; val n = 800
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (math.sin(2 * math.Pi * 440.0 * i / rate) * 12000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.MediaMeta("audio", 0, 0, n, rate, "audio/wav")
    val rows = Seq(
      Multimodal.MediaRow(0L, bos.toByteArray, meta),
      Multimodal.MediaRow(1L, pcm, meta.copy(content_type = "audio/pcm")))
    val feats = Multimodal.decodeAudioFeatures(
      spark.createDataset(rows)).orderBy("media_id").collect()
    assert(feats.length == 2)
    val Array(wav, raw) = feats
    assert(wav.features(0) == 800f && raw.features(0) == 800f)
    assert(wav.features(1) == 8000f && raw.features(1) == 8000f)
    // same samples → identical RMS/ZCR through both paths
    assert(wav.features(2) == raw.features(2))
    assert(wav.features(3) == raw.features(3))
  }

  test("frame sampling strides video frames") {
    val frames = Multimodal.sampleFrames(
      media.as[Multimodal.MediaRow], stride = 4)
    val perMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("mx")).collect()
    assert(perMedia.nonEmpty)
    perMedia.foreach { r =>
      assert(r.getAs[Int]("mx") % 4 == 0) // stride respected
    }
    // only video rows produce frames
    val kinds = frames.select("kind").distinct().as[String].collect()
    assert(kinds.toSeq == Seq("video"))
  }

  test("real video roundtrip: animated GIF container holds the metadata " +
      "frame count; every decoded frame's dimensions and channel sums " +
      "match the closed form the q87 oracle recomputes") {
    val vids = Multimodal.syntheticVideoTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val sample = vids.orderBy("media_id").limit(5).collect()
    sample.foreach { v =>
      // genuine GIF container bytes, not raw pixels
      assert(new String(v.payload.take(6), "US-ASCII").startsWith("GIF8"),
        s"media ${v.media_id} payload is not a GIF container")
      assert(v.meta.n_frames == (v.media_id % 5 + 2).toInt)
    }
    // stride=1 decodes EVERY frame; counts come from the container
    val frames = Multimodal.decodeVideoFrames(vids, stride = 1)
      .filter(col("media_id") < 20).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      assert(fs.length == (id % 5 + 2).toInt,
        s"media $id decoded ${fs.length} frames")
      assert(fs.map(_.frame_idx).toSeq.sorted == (0 until fs.length))
    }
    frames.foreach { f =>
      assert(f.frame_w == 8 && f.frame_h == 8)
      var ers = 0L; var egs = 0L; var ebs = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val idx = ((f.media_id * 2654435761L + f.frame_idx * 977 +
          x * 31 + y * 131) & 0xff).toInt
        ers += idx; egs += 255 - idx; ebs += (idx * 73) & 0xff
      }
      assert(f.sum_r == ers && f.sum_g == egs && f.sum_b == ebs,
        s"media ${f.media_id} frame ${f.frame_idx}: decoded " +
          s"(${f.sum_r},${f.sum_g},${f.sum_b}) expected ($ers,$egs,$ebs)")
    }
  }

  test("decodeVideoFrames strides through the container and skips " +
      "non-video rows") {
    val vids = Multimodal.syntheticVideoTable(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val strided = Multimodal.decodeVideoFrames(vids, stride = 2)
      .filter(col("media_id") < 20).collect()
    strided.groupBy(_.media_id).foreach { case (id, fs) =>
      val nf = (id % 5 + 2).toInt
      assert(fs.map(_.frame_idx).toSeq.sorted == (0 until nf by 2),
        s"media $id sampled wrong frames")
    }
    // non-video payloads (kind != video) yield zero rows
    val nonVideo = media.as[Multimodal.MediaRow]
      .filter(_.meta.kind != "video")
    assert(Multimodal.decodeVideoFrames(nonVideo, stride = 1).isEmpty)
  }

  test("sceneCuts: per-media lag deltas, threshold decision, and no " +
      "transition row for frame 0 (hand-built frames, codec-free)") {
    val frames = Seq(
      // media 1: sums step 100 -> 150 -> 400 (deltas 150, 750)
      Multimodal.FrameRow(1L, 0, 8, 8, 100L, 0L, 0L),
      Multimodal.FrameRow(1L, 1, 8, 8, 200L, 50L, 0L),
      Multimodal.FrameRow(1L, 2, 8, 8, 100L, 50L, 650L),
      // media 2: single frame — no transitions at all
      Multimodal.FrameRow(2L, 0, 8, 8, 7L, 7L, 7L)
    ).toDS()
    val got = Multimodal.sceneCuts(frames, minDelta = 500L)
      .select($"media_id", $"frame_idx", $"delta", $"is_cut")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 1L, 150L, false),   // |200-100| + |50-0| + 0
      (1L, 2L, 750L, true)))   // |100-200| + 0 + |650-0|
  }
}
