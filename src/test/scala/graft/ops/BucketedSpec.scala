package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  /** Every node of the plan that actually executed. An executed AQE
    * plan is a tree of QueryStageExec LEAVES (ResultQueryStage /
    * ShuffleQueryStage) whose real operators hang off `.plan`, which
    * `collect` never enters — pins that don't expand the stages pass
    * vacuously on any executed plan.
    */
  private def finalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case q: QueryStageExec => q +: expand(q.plan)
        case n => Seq(n)
      }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case p => expand(p)
    }
  }

  test("co-located join: SortMergeJoin with zero Exchange and zero Sort") {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "_")
    val lt = s"bkt_l_$tag"
    val rt = s"bkt_r_$tag"
    Bucketed.writeBucketed(
      (1L to 100L).map(i => (i, i * 2)).toDF("k", "lv"), lt, 4, Seq("k"))
    Bucketed.writeBucketed(
      (50L to 150L).map(i => (i, s"r$i")).toDF("k2", "rv"), rt, 4, Seq("k2"))
    try {
      val joined = Bucketed.coLocatedJoin(spark, lt, rt, "k", "k2")
      // the result is the plain join
      val got = joined.select(col("k"), col("lv"), col("rv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      got shouldBe (50L to 100L).map(i => (i, i * 2, s"r$i")).toSet
      // pin the plan that actually RAN (post-AQE, post-
      // EnsureRequirements — sparkPlan would pass these vacuously
      // because the Sorts/Exchanges aren't inserted yet at that stage)
      val nodes = finalNodes(joined)
      nodes.collect { case s: SortMergeJoinExec => s } should not be empty
      nodes.collect { case e: ShuffleExchangeExec => e } shouldBe empty
      // zero Sort holds because writeBucketed single-files each bucket
      // (scan only reports bucket sort order with ≤1 file per bucket,
      // surfaced via the legacy outputOrdering conf the session
      // profile pins — GraftSession.tuningConfigs / TestSpark)
      nodes.collect { case s: SortExec => s } shouldBe empty
      // mutation proof — the same join WITHOUT the bucket layout
      // (repartition(5) destroys it) DOES shuffle and sort, so the
      // pins above cannot pass vacuously
      val plainUnbkt = spark.table(lt).repartition(5)
        .hint("merge").join(spark.table(rt).repartition(5).hint("merge"),
          col("k") === col("k2"))
      plainUnbkt.collect()
      val mutated = finalNodes(plainUnbkt)
      mutated.collect { case e: ShuffleExchangeExec => e } should not be empty
      mutated.collect { case s: SortExec => s } should not be empty
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $lt")
      spark.sql(s"DROP TABLE IF EXISTS $rt")
    }
  }

  test("aggregation on the bucket key also skips its Exchange") {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "_")
    val t = s"bkt_a_$tag"
    Bucketed.writeBucketed(
      (1L to 100L).map(i => (i % 10, i)).toDF("k", "v"), t, 4, Seq("k"))
    try {
      val agg = spark.table(t).groupBy("k").agg(sum("v").as("s"))
      agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        .apply(0L) shouldBe (10L + 20L + 30L + 40L + 50L + 60L + 70L + 80L + 90L + 100L)
      finalNodes(agg).collect { case e: ShuffleExchangeExec => e } shouldBe empty
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
