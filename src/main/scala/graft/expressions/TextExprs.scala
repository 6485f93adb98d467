package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen shim shared by the text expressions: emit a call back into
  * the expression instance (via addReferenceObj) instead of falling back
  * to CodegenFallback — the surrounding operators stay inside ONE
  * whole-stage-codegen span, and the expression body runs as plain JVM
  * code either way. */
private[expressions] trait SelfCallCodegen { self: UnaryExpression =>
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cg = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      val ref = ctx.addReferenceObj("graftExpr", self,
        self.getClass.getName)
      val jt = cg.javaType(dataType)
      if (cg.isPrimitiveType(dataType))
        s"${ev.value} = ((${cg.boxedType(dataType)}) " +
          s"$ref.nullSafeEval($c)).${jt}Value();"
      else
        s"${ev.value} = ($jt) $ref.nullSafeEval($c);"
    })
}

/** Native single-pass text expressions.
  *
  * The higher-order-function formulations (transform/slice/concat_ws for
  * shingles; 64 separate min(hash) aggregates for MinHash) are correct
  * but interpreted and — worse — subject to CollapseProject inlining the
  * array-construction into every downstream consumer, multiplying the
  * work 2-4× per query. These expressions do one pass per row in plain
  * JVM code and participate in whole-stage codegen via SelfCallCodegen.
  */

/** Distinct word n-gram shingles of a whitespace-tokenized text, order of
  * first occurrence (same set as array_distinct of the HOF build, and as
  * DuckDB's list_distinct(list_transform(...)) oracle formulation). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with SelfCallCodegen {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ALL word n-gram shingles in token order (positional, duplicates
  * kept) — the inverted-index key stream of substring-level dedup,
  * where posexplode positions must be true token offsets. Same single
  * tokenize pass as [[WordShingles]]; the higher-order-function
  * formulation (`transform(sequence(...), i => concat_ws(slice(split(
  * text)...)))`) re-evaluates `split(text)` inside the lambda for
  * EVERY gram — O(tokens²) characters scanned per document, which a
  * 100 k-token document turns into gigabytes of rescanning. This is
  * one O(tokens) pass. */
case class WordShinglesAll(child: Expression, n: Int)
    extends UnaryExpression with SelfCallCodegen {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Overlapping token-window chunks (window tokens long, every stride
  * tokens) — the chunking step of an embedding/training pipeline, one
  * chunk per stride offset with the last chunks clamped at the text's
  * end. Native for the same reason as [[WordShinglesAll]]: the HOF
  * formulation re-splits the text for every chunk (O(tokens²/stride)
  * characters per document). */
case class ChunkTokens(child: Expression, window: Int, stride: Int)
    extends UnaryExpression with SelfCallCodegen {
  require(window >= stride && stride > 0,
    s"need window >= stride > 0, got window=$window stride=$stride")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val chunks = (toks.length - 1) / stride + 1
    val out = new Array[Any](chunks)
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < chunks) {
      sb.setLength(0)
      val start = c * stride
      val end = math.min(start + window, toks.length)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j)); j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash of a whitespace-tokenized text: one md5-derived
  * 64-bit hash per token, ±1 per bit position, sign-packed (ties → 0).
  *
  * The per-token hash is the little-endian u64 of md5-digest bytes
  * 8..15 — exactly DuckDB's `md5_number_lower` — so the whole signature
  * is ENGINE-PORTABLE: the q33 gate runs under a real DuckDB oracle
  * instead of a rows-only check (the md5 trick that makes q69's
  * deterministic sampling oracle-checkable, applied to SimHash).
  * md5 here is a portable mixer, not crypto. */
case class SimHash64(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = LongType

  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = digests.get()
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var k = 15
      while (k >= 8) { h = (h << 8) | (d(k) & 0xffL); k -= 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash-LSH band hashes straight from a shingle array: k min-hashes
  * via one xxhash64 per shingle + k universal-hash mixes (h_i = a_i·h +
  * b_i, odd a_i — the standard one-permutation trick), grouped into
  * `bands` bands of k/bands rows, each band hashed to one long.
  * Emitting band hashes directly (instead of a signature column that a
  * band expression would re-reference) sidesteps the CollapseProject
  * recompute hazard entirely. Deterministic: constants seeded from
  * `seed`. Empty shingle set → empty array (doc joins no bucket). */
case class LshBandHashes(child: Expression, k: Int, bands: Int,
    seed: Long = 42L)
    extends UnaryExpression with SelfCallCodegen {
  require(k % bands == 0, s"bands ($bands) must divide k ($k)")
  private val r = k / bands
  // deterministic mixing constants (odd multipliers)
  @transient private lazy val mix: Array[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    Array.fill(k)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, StringType, 42L)
      var j = 0
      while (j < k) {
        val hj = mix(j)._1 * h + mix(j)._2
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 1125899906842597L // fold the band's rows into one long
      var j = b * r
      while (j < (b + 1) * r) { acc = acc * 31L + mins(j); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Unicode fold for cross-lingual dedup keys: NFD-decompose, strip
  * combining marks (categories Mn/Mc/Me), lowercase (root locale) — so
  * "Électricité", "électricité" and "electricite" share one key. One
  * pass per row, whole-stage-codegen via SelfCallCodegen.
  *
  * ENGINE-PORTABLE by construction with DuckDB's
  * `lower(strip_accents(x))` for precomposed Latin text (the gate
  * corpus): NFD splits a precomposed letter into base + combining
  * mark, dropping the mark leaves the base letter strip_accents
  * produces, and both engines lowercase ASCII identically. (Full
  * NFKC compatibility folding — width, ligatures — is deliberately
  * out: DuckDB has no NFKC surface to oracle it against.) */
case class FoldText(child: Expression)
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      val t = Character.getType(c)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      sb.toString.toLowerCase(java.util.Locale.ROOT))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every k-token gram, slide a window
  * of `w` consecutive gram hashes, and keep the RIGHTMOST minimum of
  * each window. The guarantee (§3 of the paper): any shared run of
  * w + k − 1 tokens between two documents yields at least one shared
  * fingerprint, while only ~2/(w+1) of grams are kept — the
  * sub-sampling that makes fingerprint joins tractable where the full
  * q34 rolling-hash sequence or q90's every-gram inverted index would
  * be w× larger. Degenerate inputs stay total: fewer than w grams →
  * one window over all of them; fewer than k tokens → no fingerprints.
  *
  * Engine-portable: tokens split on single spaces (the q26/q34
  * convention), gram hash = first 13 md5 hex chars as a 52-bit long
  * (q34's convention — DuckDB `CAST(('0x' || substr(md5(g),1,13)) AS
  * BIGINT)`), so a SQL oracle replays the whole selection. Output:
  * array<struct<pos: int — 0-based gram index, fp: long>> of the
  * DISTINCT selections in position order. One pass per row. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with SelfCallCodegen {
  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def hash52(s: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 13 hex chars = bytes 0..5 and the high nibble of byte 6
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(6) & 0xf0L) >>> 4)
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val g = toks.length - k + 1
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    if (g > 0) {
      val hs = new Array[Long](g)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < g) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        hs(i) = hash52(sb.toString)
        i += 1
      }
      val nWin = math.max(g - w + 1, 1)
      var s = 0
      while (s < nWin) {
        val end = math.min(s + w, g)
        var mi = s
        var p = s + 1
        while (p < end) { // rightmost min: ties move the index forward
          if (hs(p) <= hs(mi)) mi = p
          p += 1
        }
        if (out.isEmpty || out.last._1 != mi) out += ((mi, hs(mi)))
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map { case (p, fp) =>
        org.apache.spark.sql.catalyst.InternalRow(p, fp): Any
      }.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
