package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The exact-long argmin kernel shared by interpreted and generated
  * code (static forwarder, the [[MatVec]] pattern): over a k×dim
  * centroid matrix, the (d2, cluster) pair minimizing
  * Σ_i (x_i − c_i)² in exact long arithmetic, ties to the LOWEST
  * cluster id (ascending scan + strict <, the lexicographic
  * least((d2, cid)) order of the Column formulation it replaces).
  *
  * Like [[MatVec]] (and unlike the score-only float kernel in
  * [[NearestCentroid]]), the input length is REQUIRED to equal `dim`:
  * the old aggregate(zip_with(...)) formulation null-padded a ragged
  * vector into a null d2, and this argmin's output is STORED (codes,
  * cluster assignments) — throwing with context beats persisting a
  * silently different assignment. */
object NearestLong {
  def apply(v: ArrayData, flat: Array[Long], k: Int,
      dim: Int): InternalRow = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid_long: input vector has ${v.numElements()} " +
          s"elements but centroids are $dim-dim — a ragged vector " +
          "would corrupt stored assignments, refusing")
    // One guarded copy to a primitive array: a null ELEMENT would be
    // silently read as 0 by getLong (ADVICE r18 — the same
    // silent-corruption class the ragged guard refuses, where the old
    // least(aggregate(zip_with)) formulation propagated null), and the
    // copy also keeps the k·dim inner loop off ArrayData dispatch.
    val x = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"nearest_centroid_long: null element at index $i — a null " +
            "component would corrupt stored assignments, refusing")
      x(i) = v.getLong(i)
      i += 1
    }
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0L
      i = 0
      while (i < dim) {
        val diff = x(i) - flat(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, best))
  }
}

/** Native struct(d2: long, cluster: int) argmin of an array<long>
  * column against k inlined centroids — the exact-arithmetic sibling
  * of [[NearestCentroid]] for the deterministic k-means family
  * (Cluster.nearestExpr, every PQ subspace argmin).
  *
  * The Column-API formulation — least() over k struct(aggregate(
  * zip_with(...)), lit) subtrees — is the same arithmetic but (a)
  * aggregate/zip_with are higher-order functions with NO codegen
  * (CodegenFallback: per-row lambda dispatch + boxing, k·dim times per
  * row), and (b) the literal tree grows with k·dim: the q124 plan
  * carried ~50 KB of expression text per subspace projection, paid
  * again at every Lloyd round's re-plan. This expression is a
  * two-level primitive loop inside whole-stage codegen, bit-identical
  * to the composed form (exact longs, same lowest-id tiebreak). */
case class NearestCentroidLong(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {

  private val k = cents.size
  private val dim = cents.headOption.map(_.size).getOrElse(0)
  require(k > 0 && dim > 0 && cents.forall(_.size == dim),
    s"centroid rows must share one length, got ${cents.map(_.size).distinct}")

  /** flat layout: c·dim + i */
  @transient private lazy val flat: Array[Long] = cents.flatten.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"nearest_centroid_long needs array<bigint>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    NearestLong(input.asInstanceOf[ArrayData], flat, k, dim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centsFlat", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.expressions.NearestLong.apply(
         |  $v, $flatRef, $k, $dim);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
