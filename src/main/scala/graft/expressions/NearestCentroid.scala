package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF coarse-quantizer assignment: index of the centroid nearest (by
  * squared L2) to the input vector, ties to the lowest index.
  *
  * The Column-API formulation (array of nLists composed `l2sq` columns +
  * array_position(array_min)) expands to 3·nLists VecDot subtrees each
  * carrying a dim-sized literal — at 16 lists × 64 dims the generated
  * method was kilobytes of straight-line code and the build spent its
  * wall time in janino, not arithmetic (same failure mode as the
  * per-plane signatures, see [[HyperplaneSigs]]). This expression embeds
  * the centroid matrix as one flat reference array and runs a two-level
  * primitive loop inside whole-stage codegen.
  *
  * Assignment numerics do not affect the q51 oracle identity: a
  * full-probe IVF query reads every list, so it equals brute force
  * whatever the quantizer assigns; partial-probe recall depends only on
  * assignment *consistency* between build and probe, which both sides
  * get from the same centroid matrix.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  private val nLists = centroids.size
  private val dim = centroids.head.size
  require(nLists > 0 && dim > 0, "centroid matrix must be non-empty")

  /** flat layout: c·dim + d */
  @transient private lazy val flat: Array[Double] =
    centroids.flatten.toArray

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"nearest_centroid needs array<float|double>, " +
            s"got ${t.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val isF = elemIsFloat
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < nLists) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - flat(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      val get =
        if (elemIsFloat) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $nLists; $c++) {
         |  int $off = $c * $dim;
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = $get - $flatRef[$off + $i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
