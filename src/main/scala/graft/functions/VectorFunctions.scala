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

  /** Multi-table LSH probe-membership predicate: true iff the vector's
    * signature lands in a probed bucket of at least one table. ONE
    * native expression with per-table early exit — the composed
    * per-table `element_at(...).isInCollection(...)` OR gets its
    * signature subtree re-inlined per disjunct by filter pushdown
    * (64 full signature passes per row; see LshProbeHit's scaladoc). */
  def lshProbeHit(v: Column, planeTables: Seq[Seq[Seq[Double]]],
      probeSets: Seq[Seq[Long]]): Column =
    GraftColumnBridge.column(graft.expressions.LshProbeHit(
      GraftColumnBridge.expression(v), planeTables, probeSets))

  /** Max-abs int8 quantization scale: 127 / max|v_i|. Symmetric
    * per-vector quantization — the standard embedding-storage shrink
    * (4 bytes/dim → 1) whose ~0.1% reconstruction error is invisible to
    * cosine ranking. Kept as higher-order functions: quantization is a
    * storage pass, not a hot scoring loop (the native-Expression upgrade
    * applies if it ever is). */
  def int8Scale(v: Column): Column =
    lit(127.0) / array_max(transform(v, x => abs(x.cast("double"))))

  /** int8 codes under [[int8Scale]]'s scale: floor(x·scale + 0.5) —
    * explicit half-up rounding, which every engine computes identically
    * (engine round() builtins disagree on ties: half-up vs half-even).
    * |x·scale| ≤ 127 by construction, so no clamp is needed. */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x =>
      floor(x.cast("double") * scale + lit(0.5)).cast("int"))

  /** Worst-case per-vector reconstruction error of the int8 codes,
    * in the original embedding units. */
  def int8MaxError(v: Column, scale: Column): Column =
    array_max(transform(v, x =>
      abs(floor(x.cast("double") * scale + lit(0.5)).cast("double")
        / scale - x.cast("double"))))

  /** Deterministic pseudo-random unit-free hyperplanes (seeded). */
  def makePlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
