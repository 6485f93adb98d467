package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4648 Base32 (no padding) codec — the reference uses it to make
  * arbitrary stream ids filesystem-safe (reference src/server.rs:103-108,
  * 141). Spark has no base32 builtin, so this is a custom scalar
  * Expression pair (SURVEY.md §2.2 "scalar functions" row); the codec
  * itself is also exposed for driver-side path construction.
  */
object Base32 {
  private val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  def encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L; var bits = 0
    bytes.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) {
        sb.append(alphabet(((buffer >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(alphabet(((buffer << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var buffer = 0L; var bits = 0
    s.foreach { c =>
      val v = if (c < 128) rev(c) else -1
      require(v >= 0, s"invalid base32 char '$c'")
      buffer = (buffer << 5) | v; bits += 5
      if (bits >= 8) { out.write(((buffer >> (bits - 8)) & 0xff).toInt); bits -= 8 }
    }
    out.toByteArray
  }

  def encodeString(s: String): String = encode(s.getBytes("UTF-8"))
  def decodeString(s: String): String = new String(decode(s), "UTF-8")

  /** base32(string) Column. */
  def base32(c: Column): Column =
    GraftColumnBridge.column(Base32Encode(GraftColumnBridge.expression(c)))
  /** unbase32(string) Column. */
  def unbase32(c: Column): Column =
    GraftColumnBridge.column(Base32Decode(GraftColumnBridge.expression(c)))
}

case class Base32Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      Base32.encode(v.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""UTF8String.fromString(
            graft.functions.Base32.encode($c.getBytes()))""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class Base32Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(Base32.decode(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""UTF8String.fromBytes(
            graft.functions.Base32.decode($c.toString()))""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
