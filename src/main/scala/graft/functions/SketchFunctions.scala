package graft.functions

import org.apache.spark.sql.Column

/** Sketch-backed columnar predicates (bloom membership today). */
object SketchFunctions {
  /** Per-row membership probe of a serialized Bloom filter built with
    * `DataFrameStatFunctions.bloomFilter` over a STRING column (build
    * and probe must share the UTF-8 byte view — see
    * [[graft.expressions.BloomMightContain]]). May return false
    * positives, never false negatives: follow with an exact join when
    * exactness matters. */
  def bloomMightContain(key: Column, serialized: Array[Byte]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.BloomMightContain(
      GraftColumnBridge.expression(key), serialized))
  }
}
