package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Merge-walk kernels over SORTED arrays — the rerank hot path of the
  * similarity-join family (static forwarders, the [[MatVec]] pattern).
  *
  * Why not array_intersect / map_zip_with: the rerank step of every
  * candidate-generation operator (PrefixJoin, Dedup LSH/capped/
  * incremental, SparseSim) evaluates one set-intersection or
  * sparse-dot PER CANDIDATE PAIR. Spark's ArrayIntersect builds a
  * hash set and materializes the intersection ARRAY per row just to
  * take its size, and map_zip_with allocates a merged map per row and
  * then folds it with an interpreted lambda — measured 5-6× the cost
  * of the joins that feed them (q145: 4.9 s of a 6.2 s rerank at
  * 190k pairs). Over arrays pre-sorted ONCE PER DOCUMENT, both
  * reductions are a single allocation-free two-pointer walk. */
object SortedMerge {
  // Null ELEMENTS refuse loudly (ADVICE r18): getLong reads a null
  // slot as 0 and getUTF8String as null — either silently corrupts a
  // count whose consumers treat it as exact. Only VISITED slots need
  // the guard: once one side is exhausted the other side's tail cannot
  // contribute to the result whatever its values are.
  private def nullAt(op: String, idx: Int): Nothing =
    throw new IllegalArgumentException(
      s"$op: null array element at index $idx — inputs must be " +
        "sorted null-free arrays, refusing")

  /** |A ∩ B| of two ASC-sorted duplicate-free string arrays. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) nullAt("sorted_intersect_count", i)
      if (b.isNullAt(j)) nullAt("sorted_intersect_count", j)
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** |A ∩ B| of two ASC-sorted duplicate-free LONG arrays — the
    * hashed-token variant of [[intersectCount]] (primitive compares,
    * no UTF8String walks). Callers must prove the long mapping is
    * injective on their corpus before counting on it (PrefixJoin
    * checks count-distinct parity and falls back to strings). */
  def intersectCountLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) nullAt("sorted_long_intersect_count", i)
      if (b.isNullAt(j)) nullAt("sorted_long_intersect_count", j)
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Σ_g cnt_a(g)·cnt_b(g) over two entry arrays sorted ASC by key —
    * rows are struct(key: string, cnt: long), keys unique per side
    * (a gram-count posting list). Only common keys contribute,
    * exactly like the map_zip_with(coalesce·coalesce) fold. */
  def entriesDot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var dot = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) nullAt("sorted_entries_dot", i)
      if (b.isNullAt(j)) nullAt("sorted_entries_dot", j)
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) {
        dot += ra.getLong(1) * rb.getLong(1); i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    dot
  }
}

/** Count of common elements of two ASC-sorted duplicate-free
  * array<string> columns — size(array_intersect(a, b)) for arrays the
  * caller sorted once per document (array_sort over distinctShingles
  * output; sorting per DOC is O(n log n) once, the walk per PAIR is
  * O(na+nb) with zero allocation). Bit-identical to the
  * array_intersect size on such inputs: both compare strings by
  * UTF8String binary order. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("sorted_intersect_count needs two " +
            s"array<string>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMerge.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedMerge.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** [[SortedIntersectCount]] over ASC-sorted duplicate-free
  * array<bigint> columns — primitive-long merge walk. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("sorted_long_intersect_count needs two " +
            s"array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMerge.intersectCountLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedMerge" +
        s".intersectCountLong($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Sparse integer dot product of two posting lists held as
  * array<struct<key: string, cnt: long>> sorted ASC by key — the
  * allocation-free replacement for
  * aggregate(map_values(map_zip_with(ma, mb, coalesce·coalesce))).
  * Keys unique per side; only common keys contribute. */
case class SortedEntriesDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def okEntries(t: DataType): Boolean = t match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(0).dataType == StringType && fields(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (okEntries(left.dataType) && okEntries(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("sorted_entries_dot needs two " +
          "array<struct<string, bigint>>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMerge.entriesDot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedMerge.entriesDot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
