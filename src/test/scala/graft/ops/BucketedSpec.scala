package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {
  import spark.implicits._

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
      // pre-AQE plan carries the bucket-layout decision
      val plan = joined.queryExecution.sparkPlan
      plan.collect { case s: SortMergeJoinExec => s } should not be empty
      plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
      plan.collect { case s: SortExec => s } shouldBe empty
      // and the result is the plain join
      val got = joined.select(col("k"), col("lv"), col("rv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      got shouldBe (50L to 100L).map(i => (i, i * 2, s"r$i")).toSet
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
      agg.queryExecution.sparkPlan
        .collect { case e: ShuffleExchangeExec => e } shouldBe empty
      agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        .apply(0L) shouldBe (10L + 20L + 30L + 40L + 50L + 60L + 70L + 80L + 90L + 100L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
