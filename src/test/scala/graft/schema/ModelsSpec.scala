package graft.schema

import graft.SparkSpec

/** Typed facades decode the real testdata; GraftSession wiring. */
class ModelsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("typed events decode and filter with lambdas") {
    val ds = Models.events(spark, sf)
    val purchases = ds.filter(_.event_type == "purchase")
    purchases.count() should be > 0L
    purchases.head().value should be >= 0.0
  }

  test("typed documents expose consistent n_chars") {
    import spark.implicits._
    val bad = Models.documents(spark, sf)
      .map(d => (d.doc_id, d.text.length.toLong, d.n_chars))
      .filter(t => t._2 != t._3)
    bad.count() shouldBe 0L
  }

  test("typed embeddings carry fixed-width vectors and labels") {
    val e = Models.embeddings(spark, sf).head()
    e.embedding.length shouldBe 64
  }

  test("unseenByBloom: never re-admits seen docs, passes most new ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seen = (1 to 300).map(i => (i.toLong, s"seen doc $i")).toDF("doc_id", "text")
    val dupes = (1 to 50).map(i => (1000L + i, s"seen doc $i"))
    val fresh = (1 to 100).map(i => (2000L + i, s"brand new doc $i"))
    val newDocs = (dupes ++ fresh).toDF("doc_id", "text")
    val kept = graft.ext.Dedup.unseenByBloom(newDocs, seen, "doc_id", "text",
      expectedSeen = 1000, fpp = 0.01)
    // no false negatives: every kept doc is genuinely new
    kept.filter(col("doc_id") < 2000L).count() shouldBe 0L
    // ~1% fpp: nearly all 100 fresh docs survive
    kept.count().toDouble should be >= 90.0
  }

  test("GraftSession tuning profile pins AQE, skew handling, UTC, sizing") {
    val c = graft.GraftSession.tuningConfigs(parallelism = 48)
    c("spark.sql.adaptive.enabled") shouldBe "true"
    c("spark.sql.adaptive.skewJoin.enabled") shouldBe "true"
    c("spark.sql.shuffle.partitions") shouldBe "48"
    c("spark.sql.session.timeZone") shouldBe "UTC"
    c("spark.sql.files.maxPartitionBytes") shouldBe (128 * 1024 * 1024).toString
    c("spark.sql.parquet.compression.codec") shouldBe "zstd"
    graft.GraftSession.builder(48) should not be null
  }
}
