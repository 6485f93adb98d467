package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** THE hyperplane-signature kernel: bit p of table t's signature =
  * sign(v · planes(t)(p)), planes flat-packed as
  * t·(numPlanes·dim) + p·dim + d. [[HyperplaneSigs]] (the signature
  * projection) and [[LshProbeHit]] (the probe-membership filter) both
  * call this — interpreted AND generated code (top-level objects get
  * static forwarders, so janino calls it directly) — so the
  * filter-by-predicate == filter-by-signature-in-probe-set invariant
  * that multi-table LSH correctness rests on lives in exactly one
  * place. Numerics: sequential left-to-right double accumulation,
  * ties (acc == 0) set the bit. */
object LshSig {
  def tableSig(v: ArrayData, isFloat: Boolean, flat: Array[Double],
      t: Int, numPlanes: Int, dim: Int): Long = {
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val off = (t * numPlanes + p) * dim
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        acc += x * flat(off + d)
        d += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

/** All random-hyperplane LSH signatures for a vector in ONE native
  * expression: output[t] packs bit p = sign(v · planes(t)(p)) for table
  * t. The Column-API formulation (numPlanes × tables separate VecDot
  * trees over array literals) planned fine but generated kilobytes of
  * code per signature — wall time was codegen/janino, not arithmetic.
  * This expression embeds the plane matrix as one flat reference array
  * and runs a three-level primitive loop inside whole-stage codegen.
  *
  * Numerics match the composed form exactly: each dot accumulates
  * (double)v[d] * plane[d] sequentially left-to-right, so signatures
  * (and every LSH==exact identity built on them) are unchanged.
  */
case class HyperplaneSigs(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val tables = planes.size
  private val numPlanes = planes.head.size
  private val dim = planes.head.head.size
  require(numPlanes <= 63, "signature must fit in a long")

  /** flat layout: t·(numPlanes·dim) + p·dim + d */
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"hyperplane_sigs needs array<float|double>, " +
            s"got ${t.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      out(t) = LshSig.tableSig(v, isF, flat, t, numPlanes, dim)
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  $out[$t] = graft.expressions.LshSig.tableSig(
         |    $v, $elemIsFloat, $flatRef, $t, $numPlanes, $dim);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
