package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ArgMaxScoreMinId]] — the hash-aggregable argmax that replaced
  * `max(struct(score, -id, ...))` in the triplet/bitext tails (r18):
  * pins exact equivalence to the struct-max form (ties, nulls, empty
  * groups, payload carry) and that the plan actually lands on
  * HashAggregate — the whole point of the rewrite.
  */
class ArgMaxSpec extends SparkSpec {
  import testImplicits._

  test("argmax equals max(struct(score, -id)) incl. exact-tie min-id") {
    val df = Seq(
      // group 1: plain max
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7),
      // group 2: exact tie on score -> min id wins
      (2L, 21L, 0.8), (2L, 20L, 0.8), (2L, 22L, 0.1),
      // group 3: single row
      (3L, 30L, -0.3)
    ).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id")).as("b"))
      .select(col("g"), col("b.score"), col("b.id"))
    val want = df.groupBy("g")
      .agg(max(struct(col("score"), (-col("id")).as("nid"))).as("b"))
      .select(col("g"), col("b.score"), (-col("b.nid")).as("id"))
    rowSet(got) shouldBe rowSet(want)
  }

  test("null scores never win; all-null group evaluates to null") {
    val df = Seq[(Long, Long, Option[Double])](
      (1L, 10L, None), (1L, 11L, Some(0.2)), (1L, 12L, None),
      (2L, 20L, None), (2L, 21L, None)
    ).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id")).as("b"))
      .select(col("g"), col("b.id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    got shouldBe Map(1L -> 11L, 2L -> -1L)
  }

  test("payload rides with the winning row") {
    val df = Seq(
      (1L, 10L, 0.5, 100.0), (1L, 11L, 0.9, 111.0), (1L, 12L, 0.9, 122.0)
    ).toDF("g", "id", "score", "pay")
    val r = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id"), col("pay")).as("b"))
      .select(col("b.id"), col("b.p0")).collect().head
    r.getLong(0) shouldBe 11L
    r.getDouble(1) shouldBe 111.0
  }

  test("NaN score matches the struct-max ordering (NaN ranks above all)") {
    // pins the NaN edge (VERDICT r18 §6): Spark's comparison operators
    // use the SQL NaN semantics (NaN > any non-NaN, NaN == NaN), so
    // beats()'s GreaterThan/EqualTo rank NaN exactly like the
    // struct-max ordering did — equivalence holds even for zero-norm
    // cosine inputs. This test is the proof; if it ever fails, the
    // call sites must re-add a NaN guard.
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9),
      (2L, 20L, Double.NaN), (2L, 21L, Double.NaN), // NaN tie -> min id
      (3L, 30L, Double.PositiveInfinity), (3L, 31L, Double.NaN)
    ).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id")).as("b"))
      .select(col("g"), col("b.score"), col("b.id"))
    val want = df.groupBy("g")
      .agg(max(struct(col("score"), (-col("id")).as("nid"))).as("b"))
      .select(col("g"), col("b.score"), (-col("b.nid")).as("id"))
    // bit-pattern compare: Scala's boxed == has NaN != NaN
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2))).toSet
    bits(got) shouldBe bits(want)
  }

  test("null-id rows never win, even on a later exact-score tie") {
    // the ADVICE r18 guard: a null-id winner used to poison the buffer
    // (LessThan(nId, bufId) -> null on the tie), silently keeping the
    // wrong row; now null-id rows are skipped like null scores
    val df = Seq[(Long, Option[Long], Double)](
      (1L, None, 0.9), (1L, Some(11L), 0.9), (1L, Some(12L), 0.9),
      (2L, None, 0.9), (2L, Some(21L), 0.1)
    ).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id")).as("b"))
      .select(col("g"), col("b.id"), col("b.score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe Map(1L -> ((11L, 0.9)), 2L -> ((21L, 0.1)))
  }

  test("plans as HashAggregate, not SortAggregate") {
    val df = Seq((1L, 10L, 0.5)).toDF("g", "id", "score")
    val plan = df.groupBy("g")
      .agg(ArgMaxFunctions.argmax_min_id(col("score"), col("id")).as("b"))
      .queryExecution.executedPlan.toString
    plan should include("HashAggregate")
    plan should not include "SortAggregate"
  }

  private lazy val testImplicits = spark.implicits
}
