package graft

import graft.functions.{Base32, TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Every SQL-registered function (GraftExtensions) agrees with its
  * Column-API counterpart when invoked through spark.sql. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("all registered SQL functions match the Column API") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_ext")
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb_ext")

    val viaSql = spark.sql(
      """SELECT doc_id, base32(text) AS b32,
         unbase32(base32(text)) AS rt,
         simhash64(text) AS sh,
         size(word_shingles(text, 3)) AS nsh,
         size(lsh_band_hashes(word_shingles(text, 3), 64, 32)) AS nbands
         FROM docs_ext""").collect()
    val viaApi = spark.table("docs_ext")
      .select($"doc_id", $"text",
        TextFunctions.simhash64($"text").as("sh"),
        size(TextFunctions.distinctShingles($"text", 3)).as("nsh"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("text"), r.getAs[Long]("sh"),
          r.getAs[Int]("nsh")))).toMap
    viaSql.foreach { r =>
      val (text, sh, nsh) = viaApi(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("rt") == text) // base32 roundtrip via SQL
      assert(Base32.decodeString(r.getAs[String]("b32")) == text)
      assert(r.getAs[Long]("sh") == sh)
      assert(r.getAs[Int]("nsh") == nsh) // word_shingles = distinct set
      assert(r.getAs[Int]("nbands") == 32)
    }

    val dotSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_ext")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d"))
      .toMap
    val dotApi = spark.table("emb_ext")
      .select($"vec_id",
        VectorFunctions.dot($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d"))
      .toMap
    assert(dotSql == dotApi)
  }
}
