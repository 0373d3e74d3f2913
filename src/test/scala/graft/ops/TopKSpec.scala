package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopK.topKPerGroup ≡ the one-phase window, across partitionings. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val order = Seq(col("v").desc, col("id").asc)

  private def plain(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(order: _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  private val data = {
    val rnd = new scala.util.Random(42)
    (1 to 2000).map(i => (s"g${i % 3}", rnd.nextInt(500), i.toLong))
  }

  test("matches the plain window on multi-partition input") {
    val df = data.toDF("g", "v", "id").repartition(7)
    rowSet(TopK.topKPerGroup(df, Seq("g"), order, k = 5)) shouldBe
      rowSet(plain(df, 5))
  }

  test("matches on single-partition input and k larger than some groups") {
    val df = data.take(10).toDF("g", "v", "id").coalesce(1)
    rowSet(TopK.topKPerGroup(df, Seq("g"), order, k = 100)) shouldBe
      rowSet(plain(df, 100))
  }

  test("deterministic under full tie-break despite arbitrary row order") {
    val ties = Seq(("a", 1, 10L), ("a", 1, 11L), ("a", 1, 12L), ("b", 2, 1L))
    val df = ties.toDF("g", "v", "id").repartition(5)
    rowList(TopK.topKPerGroup(df, Seq("g"), order, k = 2)
      .orderBy("g", "rnk")) shouldBe Seq(
      Seq("a", 1, 10L, 1), Seq("a", 1, 11L, 2), Seq("b", 2, 1L, 1))
  }
}
