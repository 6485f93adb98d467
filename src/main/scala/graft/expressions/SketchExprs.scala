package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a pre-built Bloom filter (Spark's
  * org.apache.spark.util.sketch implementation, the same family the
  * engine's own runtime row-group filtering uses). The serialized
  * filter rides the expression into the plan; each executor
  * deserializes it once (lazy, transient) and every probe is a few
  * hash-and-test operations inside whole-stage codegen — no join, no
  * shuffle, no UDF.
  *
  * Bit-compat note: the filter must have been built over the SAME byte
  * view being probed — `DataFrameStatFunctions.bloomFilter` on a string
  * column inserts the UTF-8 bytes (putString → putBinary), and this
  * probe tests `UTF8String.getBytes`, so string build + string probe
  * agree exactly. False positives possible (the caller must confirm
  * exactly downstream); false negatives impossible. */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression with SelfCallCodegen {
  override def dataType: DataType = BooleanType

  @transient private lazy val bf =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bits))

  override def nullSafeEval(v: Any): Any =
    bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
