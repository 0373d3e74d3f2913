package graft.functions

import graft.SparkSpec

/** SQL registration of the custom expressions: the FunctionRegistry
  * path must plan the same expressions the Column API uses.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot and shingle_hashes callable from SQL after register()") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    singleValue(spark.sql("SELECT vec_dot(a, b) FROM vecs")) shouldBe 11.0

    Seq("a b c d").toDF("text").createOrReplaceTempView("docs_sql")
    singleValue(spark.sql(
      "SELECT size(shingle_hashes(text, 3)) FROM docs_sql")) shouldBe 2

    singleValue(spark.sql(
      "SELECT size(minhash_signature(shingle_hashes(text, 3))) FROM docs_sql")) shouldBe
      graft.ext.HashDefs.K

    // SQL and Column API agree value-for-value
    val viaSql = spark.sql("SELECT explode(shingle_hashes(text, 3)) AS h FROM docs_sql")
    val viaCol = Seq("a b c d").toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        TextHashFunctions.shingle_hashes(org.apache.spark.sql.functions.col("text"), 3)).as("h"))
    rowSet(viaSql) shouldBe rowSet(viaCol)
  }

  test("round-10 expressions callable from SQL: span_hashes, jaro_winkler, nfc_normalize") {
    GraftFunctions.register(spark)
    Seq("a b c d").toDF("text").createOrReplaceTempView("docs_sql_r10")
    singleValue(spark.sql(
      "SELECT size(span_hashes(text, 3)) FROM docs_sql_r10")) shouldBe 2
    singleValue(spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')")) shouldBe 0.9611111111111111
    singleValue(spark.sql(
      "SELECT nfc_normalize('a' || 'b')")) shouldBe "ab"
  }

  test("shingle_hashes rejects a non-literal width") {
    GraftFunctions.register(spark)
    Seq("a b c").toDF("text").createOrReplaceTempView("docs_sql2")
    an[Exception] should be thrownBy
      spark.sql("SELECT shingle_hashes(text, length(text)) FROM docs_sql2").collect()
  }

  test("GraftExtensions class registers through SparkSessionExtensions") {
    // exercise the extension entry point directly (a fresh builder
    // session would collide with the shared test session)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registration list is what the injector consumed — both functions
    GraftFunctions.registrations.map(_._1.funcName).toSet shouldBe
      Set("vec_dot", "minhash_signature", "shingle_hashes", "simhash",
        "lsh_buckets", "span_hashes", "jaro_winkler", "nfc_normalize")
  }
}
