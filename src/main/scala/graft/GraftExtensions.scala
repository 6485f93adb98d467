package graft

import graft.expressions.{LshBandHashes, SimHash64, VecDot, WordShingles}
import graft.functions.{Base32Decode, Base32Encode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so users can
  * write `SELECT vec_dot(a, b)`, `base32(id)`, `simhash64(text)`,
  * `word_shingles(text, 3)` in plain Spark SQL.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (SparkSessionExtensions.injectFunction), or
  *  - `GraftExtensions.register(spark)` on an existing session (the
  *    driver hands us a prebuilt session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "base32" -> (es => Base32Encode(es.head)),
    "unbase32" -> (es => Base32Decode(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "word_shingles" -> (es =>
      WordShingles(es.head, intLit(es(1), "n"))),
    "lsh_band_hashes" -> (es => LshBandHashes(es.head,
      intLit(es(1), "k"), intLit(es(2), "bands"))))

  /** Register all functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
