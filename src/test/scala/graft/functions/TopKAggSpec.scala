package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TopKScoreMinId]] — the bounded map-side top-k that replaced the
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k` windows in
  * the ANN/bitext ranking tails: pins exact equivalence to the window
  * form (rank order, ties, NaN/-0.0 double semantics, null scores and
  * ids, k-boundary, payload carry) including across partial/final
  * merge paths, and that the plan lands on ObjectHashAggregate (the
  * map-side-combining path the rewrite exists for).
  */
class TopKAggSpec extends SparkSpec {
  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** The window form the aggregate must replicate bit-for-bit. */
  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "rank", "id", "score")
  }

  private def aggTopK(df: DataFrame, k: Int): DataFrame =
    df.groupBy("g")
      .agg(TopKFunctions.topk_score_min_id(col("score"), col("id"), k)
        .as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "e")))
      .select(col("g"), (col("p") + 1).as("rank"), col("e.id").as("id"),
        col("e.score").as("score"))

  test("top-k equals the row_number window: ranks, ties, k-boundary") {
    val df = Seq(
      // group 1: more rows than k, exact ties at the boundary
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.5),
      (1L, 14L, 0.5), (1L, 15L, 0.1),
      // group 2: fewer rows than k
      (2L, 20L, 0.3), (2L, 21L, 0.7),
      // group 3: single row
      (3L, 30L, -0.2)
    ).toDF("g", "id", "score")
    for (k <- Seq(1, 3, 4, 10)) {
      rowSet(aggTopK(df, k)) shouldBe rowSet(windowTopK(df, k))
    }
  }

  test("SQL double semantics: NaN ranks above all, -0.0 ties 0.0") {
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, Double.PositiveInfinity),
      (1L, 12L, 1.0), (1L, 13L, Double.NaN),
      (2L, 21L, 0.0), (2L, 20L, -0.0), (2L, 22L, -1.0)
    ).toDF("g", "id", "score")
    // NaN != NaN breaks plain Set equality even on identical rows —
    // compare doubles by bit pattern (keeps -0.0 distinct from 0.0,
    // which the output must preserve: ranking canonicalizes, the
    // carried value does not)
    def bitSet(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      rowSet(d).map(_.map {
        case x: Double => java.lang.Double.doubleToLongBits(x)
        case x => x
      })
    for (k <- Seq(2, 3, 5)) {
      bitSet(aggTopK(df, k)) shouldBe bitSet(windowTopK(df, k))
    }
  }

  test("null scores fill trailing slots only (desc NULLS LAST)") {
    val df = Seq[(Long, Long, Option[Double])](
      (1L, 10L, None), (1L, 11L, Some(0.2)), (1L, 12L, None),
      (1L, 13L, Some(0.4)),
      (2L, 20L, None), (2L, 21L, None)
    ).toDF("g", "id", "score")
    for (k <- Seq(1, 3, 10)) {
      rowSet(aggTopK(df, k)) shouldBe rowSet(windowTopK(df, k))
    }
  }

  test("merge paths agree with the single-partition window") {
    val base = (1 to 400).map { i =>
      val g = (i % 7).toLong
      // collisions on score force id tie-breaks across partitions
      (g, i.toLong, ((i * 37) % 11) / 10.0)
    }
    val spread = base.toDF("g", "id", "score").repartition(13)
    val one = base.toDF("g", "id", "score").coalesce(1)
    for (k <- Seq(1, 4, 9)) {
      rowSet(aggTopK(spread, k)) shouldBe rowSet(windowTopK(one, k))
    }
  }

  test("payloads ride with their row") {
    val df = Seq(
      (1L, 10L, 0.9, 7, 1.5f), (1L, 11L, 0.8, 8, 2.5f),
      (1L, 12L, 0.7, 9, 3.5f), (2L, 20L, 0.1, 4, 4.5f)
    ).toDF("g", "id", "score", "cell", "aux")
    val got = df.groupBy("g")
      .agg(TopKFunctions.topk_score_min_id(col("score"), col("id"), 2,
        col("cell"), col("aux")).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "e")))
      .select(col("g"), (col("p") + 1).as("rank"), col("e.id").as("id"),
        col("e.p0").as("cell"), col("e.p1").as("aux"))
    val w = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("g", "rank", "id", "cell", "aux")
    rowSet(got) shouldBe rowSet(want)
  }

  test("the plan lands on ObjectHashAggregate, not a window sort") {
    val df = (1 to 50).map(i => ((i % 3).toLong, i.toLong, i / 50.0))
      .toDF("g", "id", "score")
    val plan = aggTopK(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }
}
