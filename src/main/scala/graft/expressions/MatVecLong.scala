package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The integer matrix–vector kernel shared by interpreted and generated
  * code (static forwarder, the [[LshSig]] pattern): y_i =
  * Σ_j flat(i·dim + j) · x_j in exact long arithmetic. */
object MatVec {
  def apply(v: ArrayData, flat: Array[Long], dim: Int): Array[Long] = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val off = i * dim
      var acc = 0L
      var j = 0
      while (j < n) {
        acc += flat(off + j) * v.getLong(j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }
}

/** Native y = R·x over an array<long> column with an integer matrix R
  * embedded as one flat reference array — the learned-rotation apply
  * kernel (Pq.rotateByMatrix). The Column-API formulation (d scalar
  * sums of d products) is the same arithmetic but generates d² term
  * expressions in one projection: at d=64 that is 4096 nodes, the
  * whole-stage method passes 64 KB, and Spark silently falls back to
  * interpreted projection — correct, but off the codegen path this
  * repo pins (PlanSpec CODEGEN_ONLY). This expression is a two-level
  * primitive loop inside whole-stage codegen, bit-identical to the
  * composed form and to Pq.rotLocal. */
case class MatVecLong(child: Expression, rot: Seq[Seq[Long]])
    extends UnaryExpression {

  private val dim = rot.size
  require(dim > 0 && rot.forall(_.size == dim),
    s"rotation matrix must be square, got ${dim} rows")

  /** flat layout: i·dim + j */
  @transient private lazy val flat: Array[Long] = rot.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"mat_vec_long needs array<bigint>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(
        MatVec(input.asInstanceOf[ArrayData], flat, dim))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("rotFlat", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    graft.expressions.MatVec.apply($v, $flatRef, $dim));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
