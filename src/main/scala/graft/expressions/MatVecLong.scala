package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The integer matrix–vector kernel shared by interpreted and generated
  * code (static forwarder, the [[LshSig]] pattern): y_i =
  * Σ_j flat(i·cols + j) · x_j in exact long arithmetic over a
  * rows×cols matrix.
  *
  * The input length is REQUIRED to equal `cols`: a ragged row
  * zero-padded or truncated here would produce a silently wrong
  * rotation/projection that persists into codes (ADVICE r11) — unlike
  * the score-feeding VecDot/NearestCentroid kernels, this one's output
  * is stored, so it throws with row context instead. */
object MatVec {
  def apply(v: ArrayData, flat: Array[Long], rows: Int,
      cols: Int): Array[Long] = {
    if (v.numElements() != cols)
      throw new IllegalArgumentException(
        s"mat_vec_long: input vector has ${v.numElements()} elements " +
          s"but the matrix expects $cols — ragged input would corrupt " +
          "persisted codes, refusing")
    val out = new Array[Long](rows)
    var i = 0
    while (i < rows) {
      val off = i * cols
      var acc = 0L
      var j = 0
      while (j < cols) {
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
  * embedded as one flat reference array — the learned-rotation /
  * sign-projection apply kernel (Pq.rotateByMatrix, Linalg
  * .signProject). The Column-API formulation (rows scalar sums of cols
  * products each) is the same arithmetic but generates rows·cols term
  * expressions in one projection: at 64×64 (or 16×64 inside a
  * Generate) the whole-stage method passes 64 KB, and Spark silently
  * falls back to interpreted projection — correct, but off the codegen
  * path this repo pins (PlanSpec CODEGEN_ONLY; the r11 bench tail
  * carried exactly that janino trace, from q154's inlined sign sums).
  * This expression is a two-level primitive loop inside whole-stage
  * codegen, bit-identical to the composed form and to Pq.rotLocal.
  *
  * R may be rectangular: rows×cols with the input required to be
  * exactly cols long (see [[MatVec]]). */
case class MatVecLong(child: Expression, rot: Seq[Seq[Long]])
    extends UnaryExpression {

  private val rows = rot.size
  private val cols = rot.headOption.map(_.size).getOrElse(0)
  require(rows > 0 && cols > 0 && rot.forall(_.size == cols),
    s"matrix rows must share one length, got ${rot.map(_.size).distinct}")

  /** flat layout: i·cols + j */
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
        MatVec(input.asInstanceOf[ArrayData], flat, rows, cols))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("rotFlat", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    graft.expressions.MatVec.apply($v, $flatRef, $rows, $cols));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
