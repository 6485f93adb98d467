package graft.multimodal

import graft.SparkSuite

class AviSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def analyticSums(id: Long, f: Int, w: Int, h: Int)
      : (Long, Long, Long) = {
    var rs = 0L; var gs = 0L; var bs = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val u = Avi.pixel(id, f, x, y)
      rs += u; gs += 255 - u; bs += (u * 73) & 0xff
    }
    (rs, gs, bs)
  }

  test("container structure: RIFF/AVI framing, movi chunks, idx1") {
    val row = Avi.syntheticAviTable(docs.limit(3)).collect().head
    val p = row.payload
    assert(new String(p, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(p, 8, 4, "US-ASCII") == "AVI ")
    val s = new String(p, "ISO-8859-1")
    assert(s.contains("hdrl") && s.contains("strh") && s.contains("strf"))
    assert(s.contains("movi") && s.contains("idx1"))
    // idx1 is the final chunk: one 16-byte entry per frame
    val idxAt = p.length - (8 + 16 * row.meta.n_frames)
    assert(new String(p, idxAt, 4, "US-ASCII") == "idx1")
    val idxSize = java.nio.ByteBuffer.wrap(p, idxAt + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(idxSize == 16 * row.meta.n_frames)
    // declared RIFF size spans the whole file
    val riffSize = java.nio.ByteBuffer.wrap(p, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffSize == p.length - 8)
  }

  test("DIB frames decode bit-exact to the analytic recompute, " +
      "including the padded 20-byte row stride") {
    val vids = Avi.syntheticAviTable(docs.limit(20))
    val out = Avi.decodeAviFrames(vids, stride = 1).collect()
      .map(r => (r.media_id, r.frame_idx) -> r).toMap
    val metas = vids.collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      (0 until m.meta.n_frames).foreach { f =>
        val r = out((m.media_id, f))
        val (rs, gs, bs) = analyticSums(m.media_id, f, 6, 6)
        assert(r.frame_w == 6 && r.frame_h == 6)
        assert(r.sum_r == rs && r.sum_g == gs && r.sum_b == bs,
          s"media ${m.media_id} frame $f")
      }
      // container-driven row count: one row per frame chunk
      assert(out.keys.count(_._1 == m.media_id) == m.meta.n_frames)
    }
  }

  test("stride sampling keeps every k-th frame; non-video rows skipped") {
    val vids = Avi.syntheticAviTable(docs.limit(12))
    val sampled = Avi.decodeAviFrames(vids, stride = 2).collect()
    assert(sampled.nonEmpty)
    assert(sampled.forall(_.frame_idx % 2 == 0))
    val notVideo = vids.map(r =>
      r.copy(meta = r.meta.copy(kind = "image")))
    assert(Avi.decodeAviFrames(notVideo, stride = 1).isEmpty)
  }

  test("truncated container yields the frames that fit, no exception") {
    val full = Avi.syntheticAviTable(docs.limit(8)).collect()
      .maxBy(_.meta.n_frames)
    val nFull = Avi.decodeAviFrames(
      Seq(full).toDS(), stride = 1).count()
    assert(nFull == full.meta.n_frames)
    // cut mid-way through the movi list: fewer whole chunks survive
    val cut = full.copy(payload =
      java.util.Arrays.copyOf(full.payload, full.payload.length * 2 / 3))
    val nCut = Avi.decodeAviFrames(Seq(cut).toDS(), stride = 1).count()
    assert(nCut < nFull)
    // garbage payload: skipped entirely
    val junk = full.copy(payload = Array.fill[Byte](64)(0x41))
    assert(Avi.decodeAviFrames(Seq(junk).toDS(), stride = 1).isEmpty)
  }

  test("corrupt strf header (huge declared dims over a tiny chunk) " +
      "degrades to the bytes present instead of spinning w*h " +
      "iterations per frame") {
    // 200000x200000 declared = 4e10 loop iterations unclamped (minutes
    // of spin per frame); the clamp must bound work by the 64-byte
    // chunk and still sum exactly the pixels whose bytes are present
    val tiny = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    val payload = Avi.build(200000, 200000, 0x20424944 /* 'DIB ' */, 0,
      Seq(tiny))
    val row = Multimodal.MediaRow(9L, payload,
      Multimodal.MediaMeta("video", 200000, 200000, 1, 0,
        "video/x-msvideo"))
    val t0 = System.nanoTime()
    val r = Avi.decodeAviFrames(Seq(row).toDS(), stride = 1)
      .collect().head
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(elapsedSec < 15.0,
      f"corrupt-header decode took $elapsedSec%.1fs — clamp regressed")
    // only whole BGR triples with all three bytes inside the chunk
    // count: x*3+2 < 64 → x <= 20 → bytes 0..62
    var (rs, gs, bs) = (0L, 0L, 0L)
    for (x <- 0 to 20) {
      bs += tiny(x * 3) & 0xff
      gs += tiny(x * 3 + 1) & 0xff
      rs += tiny(x * 3 + 2) & 0xff
    }
    assert(r.sum_r == rs && r.sum_g == gs && r.sum_b == bs)
    // declared (lying) dims are still reported — metadata, not work
    assert(r.frame_w == 200000 && r.frame_h == 200000)
  }

  test("top-down DIB (negative biHeight) decodes to the same sums as " +
      "bottom-up") {
    // same pixels written in natural row order with biHeight = -6
    val id = 7L
    val stride = (6 * 3 + 3) & ~3
    val frame = new Array[Byte](stride * 6)
    for (y <- 0 until 6; x <- 0 until 6) {
      val u = Avi.pixel(id, 0, x, y)
      frame(y * stride + x * 3) = ((u * 73) & 0xff).toByte
      frame(y * stride + x * 3 + 1) = (255 - u).toByte
      frame(y * stride + x * 3 + 2) = u.toByte
    }
    val payload = Avi.build(6, -6, 0x20424944 /* 'DIB ' */, 0, Seq(frame))
    val row = Multimodal.MediaRow(id, payload,
      Multimodal.MediaMeta("video", 6, 6, 1, 0, "video/x-msvideo"))
    val r = Avi.decodeAviFrames(Seq(row).toDS(), stride = 1).collect().head
    val (rs, gs, bs) = analyticSums(id, 0, 6, 6)
    assert(r.sum_r == rs && r.sum_g == gs && r.sum_b == bs)
  }

  test("decodeFrames dispatches on container magic: a mixed GIF+AVI " +
      "column decodes both through their real codecs in one pass") {
    val gifs = Multimodal.syntheticVideoTable(docs.limit(6))
    val avis = Avi.syntheticAviTable(docs.limit(6))
    val out = Multimodal.decodeFrames(gifs.union(avis), stride = 1)
      .collect()
    val expected = Multimodal.decodeVideoFrames(gifs, 1).collect() ++
      Avi.decodeAviFrames(avis, 1).collect()
    def key(r: Multimodal.FrameRow) = (r.media_id, r.frame_idx,
      r.frame_w, r.frame_h, r.sum_r, r.sum_g, r.sum_b)
    assert(out.map(key).sorted.toSeq == expected.map(key).sorted.toSeq)
    assert(out.map(_.frame_w).distinct.sorted.toSeq == Seq(6, 8))
  }

  test("exact-JPEG MJPG: hand-rolled flat-quant DC-only baseline " +
      "JPEGs round-trip bit-exact through ImageIO and the container") {
    // direct codec check, extreme DC swings included (0 and 255 hit
    // difference category 11 in both directions): every pixel must
    // decode to exactly its block's constant
    val blocks = Array(Array(0, 37), Array(255, 128))
    val bytes = Jpeg.encodeConstantBlocks(blocks)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = blocks(y / 8)(x / 8)
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == v && ((p >> 8) & 0xff) == v &&
        (p & 0xff) == v,
        s"pixel ($x,$y): got ${(p & 0xffffff).toHexString}, want $v")
    }
    // container path: every decoded frame's sums equal the closed form
    val vids = Avi.syntheticMjpegTable(docs.limit(12))
    val out = Avi.decodeAviFrames(vids, stride = 1).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      var s = 0L
      for (by <- 0 until 2; bx <- 0 until 2)
        s += Avi.pixel(r.media_id, r.frame_idx, bx, by)
      assert(r.frame_w == 16 && r.frame_h == 16)
      assert(r.sum_r == 64 * s && r.sum_g == 64 * s && r.sum_b == 64 * s,
        s"media ${r.media_id} frame ${r.frame_idx}")
    }
  }

  test("MJPG path: the container walk hands each chunk to the JPEG " +
      "codec — frame sums match decoding the same chunk directly") {
    val imgs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, Avi.pixel(42L + f, f, x, y) * 0x010101)
      img
    }
    val payload = Avi.buildMjpeg(imgs)
    val row = Multimodal.MediaRow(1L, payload,
      Multimodal.MediaMeta("video", 16, 16, 3, 0, "video/x-msvideo"))
    val decoded = Avi.decodeAviFrames(Seq(row).toDS(), stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(decoded.length == 3)
    // expected: ImageIO decode of each chunk's bytes, extracted
    // independently of the walker (scan for JPEG SOI/EOI markers)
    val expected = imgs.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val p = dec.getRGB(x, y)
        rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
      }
      (rs, gs, bs)
    }
    decoded.zip(expected).foreach { case (r, (rs, gs, bs)) =>
      assert(r.frame_w == 16 && r.frame_h == 16)
      assert(r.sum_r == rs && r.sum_g == gs && r.sum_b == bs,
        s"frame ${r.frame_idx}")
    }
  }
}
