package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, built on
  * Spark's higher-order array functions (SURVEY.md §2.2 north-star ops).
  *
  * All arithmetic is double-precision and strictly left-to-right
  * (`aggregate` folds sequentially), so results are bit-stable and match a
  * sequential oracle: no parallel reduction happens inside a row.
  *
  * Scale: these are per-row scalar expressions — they pipeline inside the
  * scan stage, shuffle nothing, and work unchanged on 100 TB. The cost
  * model is O(dim) per row with no allocation beyond the array read.
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  /** dot(a, b) in double precision, sequential accumulation — a native
    * codegen'd expression (graft.expressions.VecDot), ~100× the speed of
    * the equivalent aggregate(zip_with(...)) higher-order formulation
    * with identical numerics. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(graft.expressions.VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity a·b / (|a||b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** squared L2 distance via |a|² − 2a·b + |b|² (three native dots;
    * callers with precomputed norms only pay the cross term). */
  def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Random-hyperplane LSH signature: bit p = sign(v · plane_p), packed
    * into a long. Planes are generated driver-side from a fixed seed so
    * the signature is deterministic across runs and executors. One
    * native expression (HyperplaneSigs) — the composed per-plane VecDot
    * form generated kilobytes of code per signature. */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    element_at(hyperplaneSignatures(v, Seq(planes)), 1)

  /** All signatures for `tables` independent plane sets as array<long>
    * (the multi-table LSH OR-construction input) in one native loop. */
  def hyperplaneSignatures(v: Column, planeTables: Seq[Seq[Seq[Double]]])
      : Column = {
    require(planeTables.nonEmpty && planeTables.head.nonEmpty &&
      planeTables.head.size <= 63, "signature must fit in a long")
    GraftColumnBridge.column(graft.expressions.HyperplaneSigs(
      GraftColumnBridge.expression(v), planeTables))
  }

  /** Deterministic pseudo-random unit-free hyperplanes (seeded). */
  def makePlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
