package graft.multimodal

/** Minimal baseline JPEG encoder (ITU-T T.81) whose output decodes
  * BIT-EXACTLY — the trick that upgrades the MJPG path from spec-gated
  * to oracle-gated (the q53/q58/q87/q89 pattern: a real codec on both
  * sides of a closed-form integer identity).
  *
  * JPEG is lossy in general, but three choices make the round trip
  * exact through any conforming decoder:
  *
  *  - every 8×8 block is CONSTANT, so the DCT has only a DC term and
  *    the IDCT of a DC-only block is exactly constant (libjpeg's
  *    integer IDCT shortcuts to `(dc << 2 + 16) >> 5`, exact when dc
  *    is a multiple of 8 — and dc = 8·(v−128) always is);
  *  - the quantization table is all ones, so quantization is the
  *    identity on that DC coefficient;
  *  - chroma is the constant 128 (DC coefficient 0), and YCbCr→RGB
  *    with Cb=Cr=128 contributes exactly zero in libjpeg's fixed-point
  *    tables — so R = G = B = Y, with Y the block constant.
  *
  * The entropy layer is real baseline Huffman coding with custom
  * minimal tables (DC: the 12 difference categories as 4-bit codes;
  * AC: a 1-bit end-of-block), raster-order interleaved MCUs, 0xFF byte
  * stuffing, and 1-padding of the final byte — everything a conforming
  * decoder exercises on a normal photo, minus the parts that lose
  * information.
  */
object Jpeg {

  /** Entropy-coded-segment bit writer with JPEG 0xFF→0xFF00 stuffing. */
  private final class BitSink {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the trailing partial byte with 1-bits (T.81 F.1.2.3). */
    def finish(): Unit = while (n != 0) put(1, 1)
  }

  /** Encode a grayscale-content image of `bw`×`bh` constant 8×8 blocks
    * (`blocks(by)(bx)` in 0..255, raster order) as a 3-component
    * YCbCr baseline JPEG that decodes to R=G=B=block value exactly. */
  def encodeConstantBlocks(blocks: Array[Array[Int]]): Array[Byte] = {
    val bh = blocks.length
    val bw = blocks(0).length
    val w = bw * 8
    val h = bh * 8
    val bos = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = bos.write(v & 0xff)
    def m(v: Int): Unit = { b(v >> 8); b(v) } // marker / 16-bit field
    m(0xFFD8) // SOI
    // APP0/JFIF so a 3-component scan is unambiguously YCbCr
    m(0xFFE0); m(16); "JFIF".foreach(c => b(c.toInt)); b(0)
    b(1); b(1); b(0); m(1); m(1); b(0); b(0)
    // DQT table 0: all ones — quantization is the identity
    m(0xFFDB); m(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(_ => b(1))
    // SOF0: 8-bit baseline, 3 components, no subsampling (1×1 each)
    m(0xFFC0); m(8 + 3 * 3); b(8); m(h); m(w); b(3)
    Seq(1, 2, 3).foreach { id => b(id); b(0x11); b(0) }
    // DHT DC table 0: the 12 difference categories, each a 4-bit code
    // (canonical: code == category); incomplete table, fully valid
    m(0xFFC4); m(2 + 1 + 16 + 12); b(0x00)
    (1 to 16).foreach(l => b(if (l == 4) 12 else 0))
    (0 to 11).foreach(b)
    // DHT AC table 0: one symbol — EOB as the 1-bit code "0"
    m(0xFFC4); m(2 + 1 + 16 + 1); b(0x10)
    (1 to 16).foreach(l => b(if (l == 1) 1 else 0))
    b(0x00)
    // SOS: all components use DC 0 / AC 0
    m(0xFFDA); m(6 + 2 * 3); b(3)
    Seq(1, 2, 3).foreach { id => b(id); b(0x00) }
    b(0); b(63); b(0)
    // Entropy: interleaved MCUs in raster order; per MCU one Y, one
    // Cb, one Cr block, each DC + EOB. Chroma DC is 0 (constant 128),
    // so its difference is always 0 → category 0 → no extra bits.
    val sink = new BitSink
    var prevY = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val dc = 8 * (blocks(by)(bx) - 128)
        val diff = dc - prevY
        prevY = dc
        val t = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        sink.put(t, 4) // DC category (code == category, 4 bits)
        if (t > 0)
          sink.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        sink.put(0, 1) // EOB: Y block has no AC
        sink.put(0, 4); sink.put(0, 1) // Cb: diff 0, EOB
        sink.put(0, 4); sink.put(0, 1) // Cr: diff 0, EOB
        bx += 1
      }
      by += 1
    }
    sink.finish()
    sink.out.toByteArray.foreach(v => b(v.toInt))
    m(0xFFD9) // EOI
    bos.toByteArray
  }
}
