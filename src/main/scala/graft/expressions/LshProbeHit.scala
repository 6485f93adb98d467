package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Boolean predicate of multi-table LSH probing: is the row's vector in
  * a probed bucket of AT LEAST ONE table? (The OR-construction's
  * candidate filter — see Similarity.lshTableCandidates.)
  *
  * Why an expression and not composed Columns: the composed form —
  * `element_at(hyperplane_sigs(v), t).isInCollection(probes(t))` OR'd
  * over t — is torn apart by filter pushdown. PushDownPredicates
  * inlines the `__sigs` projection alias into every disjunct, so a
  * 64-table filter evaluates the FULL 64-table signature array 64
  * times per row (measured: 129 s for one 60k-row query at sf0.1).
  * Here each table's signature is computed once, membership is a
  * binary search over that table's sorted probe set, and the table
  * loop exits on the first hit — candidate rows stop after the first
  * matching table, and even a miss costs exactly one signature pass
  * (the same work the signature projection itself costs).
  *
  * Numerics are [[LshSig.tableSig]] — the same kernel
  * [[HyperplaneSigs]] evaluates, interpreted and generated alike — so
  * filter-by-this == filter-by-signatures-in-probe-sets bit for bit,
  * by construction rather than by hand-synced copies.
  */
case class LshProbeHit(child: Expression, planes: Seq[Seq[Seq[Double]]],
    probes: Seq[Seq[Long]]) extends UnaryExpression with Predicate {

  private val tables = planes.size
  private val numPlanes = planes.head.size
  private val dim = planes.head.head.size
  require(numPlanes <= 63, "signature must fit in a long")
  require(probes.size == tables,
    s"${probes.size} probe sets for $tables tables")

  /** flat layout: t·(numPlanes·dim) + p·dim + d */
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  /** per-table sorted probe buckets, for binary-search membership */
  @transient private lazy val sortedProbes: Array[Array[Long]] =
    probes.map(_.toArray.sorted).toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"lsh_probe_hit needs array<float|double>, " +
            s"got ${t.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var t = 0
    while (t < tables) {
      val sig = LshSig.tableSig(v, isF, flat, t, numPlanes, dim)
      if (java.util.Arrays.binarySearch(sortedProbes(t), sig) >= 0)
        return true
      t += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
    val probesRef = ctx.addReferenceObj("probesSorted", sortedProbes,
      "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val t = ctx.freshName("t")
      val sig = ctx.freshName("sig")
      s"""
         |for (int $t = 0; $t < $tables && !${ev.value}; $t++) {
         |  long $sig = graft.expressions.LshSig.tableSig(
         |    $v, $elemIsFloat, $flatRef, $t, $numPlanes, $dim);
         |  if (java.util.Arrays.binarySearch($probesRef[$t], $sig) >= 0)
         |    ${ev.value} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
