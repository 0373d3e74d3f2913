package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Naive Bayes quality-model semantics: teacher label, one-pass
  * training counts, llr scoring sign, and layout-independence of the
  * decimal score sums (the golden companion to q_quality_nb's
  * integer-surface oracle).
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // ≥200 chars, ≥5 stopwords → teacher label 1
  private val goodText = "the quick brown fox jumps over the lazy dog " +
    "and it runs for a while in the sunny field of tall grass " +
    "where the morning light is soft and the air is cool and clear " +
    "while birds sing on the old oak branches above"
  private val badText1 = "zz9 qq8 vv7 kk6"
  private val badText2 = "qq8 mm5 nn4 pp3"

  private def corpus = Seq(
    (1L, goodText), (2L, goodText + " extra tokens here"),
    (3L, badText1), (4L, badText2)).toDF("doc_id", "text")

  test("teacherLabel: long + stopword-bearing = 1, else 0") {
    val labels = corpus
      .select(col("doc_id"), QualityModel.teacherLabel(col("text")).as("y"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    labels shouldBe Seq(1, 1, 0, 0)
    // long but stopword-free stays 0: length alone can't flip it
    singleValue(Seq(("x9 " * 100).trim).toDF("text")
      .select(QualityModel.teacherLabel(col("text")))) shouldBe 0
  }

  test("nbTermWeights: class-pure terms get signed llr, counts exact") {
    val w = QualityModel.nbTermWeights(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("c1"), r.getAs[Long]("c0"),
          r.getAs[java.math.BigDecimal]("llr").doubleValue())).toMap
    // "the" appears only in good docs; "qq8" in both bad docs, never good
    w("the")._2 shouldBe 0L
    w("the")._3 should be > 0.0
    w("qq8")._1 shouldBe 0L
    w("qq8")._2 shouldBe 2L
    w("qq8")._3 should be < 0.0
  }

  test("nbQualityScores: good docs score positive, bad negative; surfaces exact") {
    val out = QualityModel.nbQualityScores(corpus, "doc_id", "text")
      .orderBy("id").collect()
    out.length shouldBe 4
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    byId(1L).getAs[Int]("y") shouldBe 1
    byId(3L).getAs[Int]("y") shouldBe 0
    byId(1L).getAs[Double]("nb_score") should be > 0.0
    byId(2L).getAs[Double]("nb_score") should be > 0.0
    byId(3L).getAs[Double]("nb_score") should be < 0.0
    byId(4L).getAs[Double]("nb_score") should be < 0.0
    // integer evidence surface: bad doc 4's tokens are qq8(c0=2) + 3 hapax
    byId(4L).getAs[Long]("n_tokens") shouldBe 4L
    byId(4L).getAs[Long]("sum_c1") shouldBe 0L
    byId(4L).getAs[Long]("sum_c0") shouldBe 5L
  }

  test("nbScoreMicro: exact integer fold, OOV contributes zero") {
    val weights = Map("alpha" -> 3L, "beta" -> -2L)
    singleValue(Seq("alpha beta alpha").toDF("text")
      .select(QualityModel.nbScoreMicro(col("text"), weights))) shouldBe 4L
    // all-OOV doc scores exactly 0 → not admitted
    singleValue(Seq("gamma delta").toDF("text")
      .select(QualityModel.nbScoreMicro(col("text"), weights))) shouldBe 0L
    Seq("gamma delta").toDF("text")
      .transform(QualityModel.admitByModel(_, weights)).count() shouldBe 0L
  }

  test("nbWeightsMicro + admitByModel: micro weights match decimal llr signs; cap fails loud") {
    val w = QualityModel.nbWeightsMicro(corpus, "doc_id", "text")
    // micro weights carry the same signs the decimal weights do
    w("the") should be > 0L
    w("qq8") should be < 0L
    // admitting the corpus itself keeps exactly the good docs (their
    // tokens carry positive evidence) and drops the bad ones
    val kept = QualityModel.admitByModel(corpus, w)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    kept shouldBe Seq(1L, 2L)
    an[IllegalArgumentException] should be thrownBy
      QualityModel.nbWeightsMicro(corpus, "doc_id", "text", maxVocab = 3)
  }

  test("nbQualityScores: layout-independent (exact decimal sums)") {
    val a = QualityModel.nbQualityScores(corpus, "doc_id", "text")
      .orderBy("id").collect().toSeq
    val b = QualityModel.nbQualityScores(corpus.repartition(7), "doc_id", "text")
      .orderBy("id").collect().toSeq
    a shouldBe b
  }
}
