package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a over `source ⊕ separator ⊕ id` — the event-store's
  * (source,id) dedup key hash (stored in `keys-*.keys` sidecars and
  * checked by the in-memory digest) as a NATIVE expression, so the
  * ingest metadata pass stays entirely inside whole-stage codegen
  * instead of deopting through a per-row Scala UDF.
  *
  * Bit-identical to `EventStore.keyHash` — which delegates here, so
  * there is exactly one definition of the hash. Works on the raw UTF-8
  * bytes of the UTF8String operands: no String materialization per row.
  */
case class KeyHash64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(src: Any, id: Any): Any =
    KeyHash64.hash(src.asInstanceOf[UTF8String].getBytes,
      id.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // static call into the companion's forwarder: primitive long out,
    // no boxing, stays in the surrounding codegen span
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.expressions.KeyHash64.hash(" +
        s"$s.getBytes(), $i.getBytes());")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KeyHash64 {
  /** FNV-1a fold of source bytes, a one-byte separator (0xff mixed as a
    * regular byte — source/id boundaries can't cancel out), then id
    * bytes. Collisions are resolved by the store's exact confirm scan,
    * so the hash only needs to be cheap and well-distributed. */
  def hash(source: Array[Byte], id: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < source.length) {
      h ^= (source(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= 0xffL
    h *= 0x100000001b3L
    i = 0
    while (i < id.length) {
      h ^= (id(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
