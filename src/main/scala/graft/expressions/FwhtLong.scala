package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** In-place fast Walsh–Hadamard butterfly over a long array (static
  * forwarder, the [[MatVec]] pattern) — y = H·x for the Sylvester
  * matrix H[i][j] = (−1)^popcount(i AND j), the same d·log d loop as
  * Pq.fwhtLocal runs driver-side on query vectors. Exact long
  * arithmetic: bit-identical to the composed ± scalar tree.
  *
  * Input length REQUIRED to equal `dim` (the [[MatVec]] discipline):
  * the rotation's output is stored into codes, so a ragged vector
  * must throw, not silently rotate a prefix. */
object Fwht {
  def apply(v: ArrayData, dim: Int): Array[Long] = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"fwht_long: input vector has ${v.numElements()} elements but " +
          s"dim=$dim — ragged input would corrupt stored codes, refusing")
    // Null elements refuse loudly (ADVICE r18): toLongArray would read
    // a null slot as 0 and silently rotate a corrupted vector into
    // stored codes — the exact class the ragged guard exists for.
    var nc = 0
    while (nc < dim) {
      if (v.isNullAt(nc))
        throw new IllegalArgumentException(
          s"fwht_long: null element at index $nc — a null component " +
            "would corrupt stored codes, refusing")
      nc += 1
    }
    val y = v.toLongArray()
    var h = 1
    while (h < dim) {
      var i = 0
      while (i < dim) {
        if ((i & h) == 0) {
          val a = y(i); val b = y(i + h)
          y(i) = a + b; y(i + h) = a - b
        }
        i += 1
      }
      h <<= 1
    }
    y
  }
}

/** Native Hadamard rotation of an array<long> column — the corpus-side
  * twin of Pq.fwhtLocal. The scalar-expression butterfly
  * (Pq.hadamardRotate's original d² ±-tree) is the same arithmetic but
  * generates d² term nodes per projection: at d=64 the generated
  * method is kilobytes of straight-line adds whose janino compile
  * dominates the query at bench scale (q128), and each Lloyd-round
  * re-plan pays the tree walk again. This kernel is the d·log d loop
  * inside whole-stage codegen. */
case class FwhtLong(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim > 0 && (dim & (dim - 1)) == 0,
    s"dim must be a power of two, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"fwht_long needs array<bigint>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Fwht(input.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    graft.expressions.Fwht.apply($v, $dim));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
