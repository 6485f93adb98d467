package graft.expressions

import graft.SparkSuite
import graft.functions.SketchFunctions.md5Prefix
import org.apache.spark.sql.functions._

/** r19: the deterministic md5-keyed families (theta, count-min,
  * bootstrap draws, priority/mix sampling, rolling hashes) moved from
  * `conv(substring(md5(x), 1, n), 16, 10)` to the native
  * [[Md5PrefixLong]] kernel. The md5 value IS the cross-engine output
  * contract of those gates, so the kernel must be bit-identical to the
  * composition it replaced — pinned here on randomized strings
  * (unicode included) at every prefix width in use. */
class Md5PrefixSpec extends SparkSuite {
  import spark.implicits._

  test("md5Prefix(x, n) == conv(substring(md5(x), 1, n), 16, 10) " +
      "bit-for-bit at n = 1, 2, 4, 8, 12, 13, 15 (randomized + edges)") {
    val rnd = new scala.util.Random(19)
    val strs = (1 to 300).map { i =>
      val len = rnd.nextInt(40)
      new String((0 until len).map(_ =>
        (rnd.nextInt(0x250) + 1).toChar).toArray)
    } ++ Seq("", "a", "bs:0:42", "th:user-17", "ünïcödé-Ω漢字",
      "0" * 100)
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for (n <- Seq(1, 2, 4, 8, 12, 13, 15)) {
      val bad = df.select(
          md5Prefix($"t", n).as("nw"),
          conv(substring(md5($"t"), 1, n), 16, 10).cast("long").as("od"))
        .filter($"nw" =!= $"od").count()
      assert(bad == 0L, s"n=$n diverged from the conv composition")
    }
    // null in → null out, matching md5(null)
    val nn = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(md5Prefix($"t", 12).isNull.as("n")).head().getBoolean(0)
    assert(nn)
  }
}
