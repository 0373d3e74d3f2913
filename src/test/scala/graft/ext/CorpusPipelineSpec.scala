package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end corpus preparation: every stage must fire on a corpus
  * built to trip it — wrong-language docs, junk-quality docs, exact
  * duplicates, near duplicates — and the output contract (one row per
  * survivor with lang/quality/tokens/split) must hold.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // long enough to clear the quality gate's length term; "the ... of"
  // markers make the lang gate score it 'en'
  private val base = ("the project of the committee is described in the " +
    "report and the findings are presented to the board for a review " +
    "of the annual results and the plan for the next year is outlined " +
    "in the final section of the document for the members to consider " +
    "and the recommendations are listed in the appendix of the report " +
    "for the convenience of the readers and the staff of the office")

  test("each stage drops exactly its targets; survivors carry the output contract") {
    val nearDup = base + " extra tail words here"
    val docs = Seq(
      (1L, base),                        // survivor (en, high quality)
      (2L, base),                        // exact dup of 1 → dropped
      (3L, nearDup),                     // near dup of 1 → dropped (jaccard > 0.5)
      (4L, "der und die das ist nicht " * 30), // de markers → dropped (lang gate: en only)
      (5L, "zz qq xx"),                  // junk → dropped (quality gate)
      (6L, "the house and the garden of the family is near the river " +
        "and the path to the village leads through the forest to the " +
        "bridge and the mill at the edge of the town where the market " +
        "is held in the square for the people of the region to trade " +
        "and the goods are sold in the stalls along the main street " +
        "of the town during the morning hours of the market day there") // distinct survivor
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.prepare(docs, "doc_id", "text",
        allowedLangs = Seq("en"), minQuality = 0.5)
      .orderBy("doc_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 6L)
    out.foreach { r =>
      r.getString(1) shouldBe "en"
      r.getDouble(2) should be >= 0.5
      r.getInt(3) should be > 0
      Set("train", "valid", "test") should contain(r.getString(5))
    }
  }

  test("output is layout-independent: any input partitioning, same rows") {
    val docs = (1L to 40L).map(i => (i, if (i % 7 == 0) base
      else base.replace("committee", s"committee$i"))).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      CorpusPipeline.prepare(df, "doc_id", "text", Seq("en"), 0.5)
        .collect().map(_.toSeq).toSet
    run(docs) shouldBe run(docs.repartition(7))
    run(docs) shouldBe run(docs.coalesce(1))
  }

  test("split assignment is stable under re-preparation of a grown corpus") {
    val docs = Seq((1L, base)).toDF("doc_id", "text")
    val grown = Seq((1L, base),
      (7L, base.replace("committee", "council"))).toDF("doc_id", "text")
    def splitOf(df: org.apache.spark.sql.DataFrame): String =
      CorpusPipeline.prepare(df, "doc_id", "text", Seq("en"), 0.5)
        .filter(col("doc_id") === 1L).head().getString(5)
    splitOf(docs) shouldBe splitOf(grown)
  }
}
