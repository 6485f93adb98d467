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

  /** First `hexDigits` md5 hex digits of a string column as a LONG —
    * the native form of `conv(substring(md5(x), 1, n), 16, 10)`
    * (bit-identical; see [[graft.expressions.Md5Prefix]]). The hash
    * primitive of every deterministic md5-keyed family: theta/KMV
    * sketches (n=12), count-min buckets (n=4), Poisson-bootstrap
    * draws (n=12), priority sampling (n=8), rolling hashes (n=13). */
  def md5Prefix(key: Column, hexDigits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.Md5PrefixLong(
      GraftColumnBridge.expression(key), hexDigits))
  }
}
