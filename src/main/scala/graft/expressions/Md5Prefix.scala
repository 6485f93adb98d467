package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First `hexDigits` hex digits of md5(utf8 bytes) as a LONG — the
  * engine-portable hash primitive behind the deterministic sketch /
  * bootstrap / sampling families (static forwarder, the [[MatVec]]
  * pattern).
  *
  * Bit-identical to the Column composition it replaces,
  * `conv(substring(md5(x), 1, n), 16, 10).cast("long")`: the md5 hex
  * string's first n characters ARE the digest's first n nibbles in
  * big-endian order, so the value is reassembled from the raw digest
  * bytes directly. What the composition paid per row and this kernel
  * does not: a fresh MessageDigest instance (commons-codec
  * DigestUtils.md5Hex allocates one per call — here a thread-local is
  * reused), a 32-char hex STRING materialization, a substring copy,
  * and NumberConverter's per-character base-16 reparse. The md5
  * itself — the cross-engine determinism contract every gate replays
  * in DuckDB — is unchanged.
  *
  * n ≤ 15 keeps the value strictly inside a positive signed long
  * (≤ 2^60); callers use 4 (count-min buckets), 8 (priority
  * sampling), 12 (theta/bootstrap 48-bit space), 13 (rolling-hash
  * 52-bit space). */
object Md5Prefix {
  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def apply(s: UTF8String, hexDigits: Int): Long = {
    val md = mdLocal.get()
    // digest() resets the instance for the next row
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Native `conv(substring(md5(x), 1, n), 16, 10)` as one expression —
  * see [[Md5Prefix]]. Null in → null out (UnaryExpression default). */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15,
    s"hexDigits must be in [1, 15] to fit a positive long, got $hexDigits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"md5_prefix_long needs a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.Md5Prefix.apply($v, $hexDigits);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
