package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The positional q-gram MULTISET of a string as
  * array<struct<g: string, occ: int>> in position order, occ = 1-based
  * rank of this occurrence among equal grams within the string (static
  * forwarder, the [[MatVec]] pattern).
  *
  * Bit-identical to the composition it replaces in [[
  * graft.operators.EditJoin]]:
  * posexplode(transform(sequence(1, len-q+1), i -> substring(s, i, q)))
  * followed by row_number() over (id, g) ordered by pos — but that
  * window is a SHUFFLE + SORT of every gram instance in the corpus
  * keyed by (id, gram), paid before the df aggregate even starts; occ
  * is a per-ROW scan quantity (a running count per gram in position
  * order), so one pass with a small per-row hash map computes it
  * inside the scan stage with zero exchanges. SQL substring semantics
  * (codepoints, 1-based) match the transform exactly. Strings shorter
  * than q yield an empty array. */
object QGramOcc {
  def apply(s: UTF8String, q: Int): GenericArrayData = {
    val n = s.numChars()
    val m = n - q + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val seen = new java.util.HashMap[UTF8String, Integer](Math.min(m, 64))
    var i = 0
    while (i < m) {
      val g = s.substringSQL(i + 1, q)
      val c = seen.get(g)
      val occ = if (c == null) 1 else c.intValue() + 1
      seen.put(g, Integer.valueOf(occ))
      out(i) = InternalRow(g, occ)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native (gram, occ) multiset expression — see [[QGramOcc]]. */
case class QGramOccs(child: Expression, q: Int)
    extends UnaryExpression {
  require(q >= 1, s"gram length must be >= 1, got $q")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("occ", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"qgram_occs needs a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    QGramOcc(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.QGramOcc.apply($v, $q);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
