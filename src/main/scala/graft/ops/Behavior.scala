package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior branch operators (SURVEY.md §2.3-§2.6, §3.2): daily search
  * logs → per-user most-searched keyword, month-over-month trend.
  */
object Behavior {

  /** P9+P10 — drop null user/keyword rows, keep only the two compared
    * months (ETL_pipeline.py:148-151). Both filters sit directly on the
    * scan so Catalyst pushes them into the parquet reader.
    */
  def filterSearch(df: DataFrame, months: Seq[Int] = Seq(6, 7)): DataFrame =
    df.filter(col("user_id").isNotNull && col("keyword").isNotNull)
      .filter(col("month").isin(months.map(Integer.valueOf): _*))

  /** A5+W1+P11 — most-searched keyword per (month, user)
    * (ETL_pipeline.py:153-158): count, rank by count desc within
    * (month, user), keep rank 1.
    *
    * The reference orders by count only, so ties are broken by
    * whatever row the window sees first — nondeterministic.
    * `deterministic = true` adds the keyword as tie-breaker, which
    * every oracle-compared query needs (SURVEY.md §7.5 #3).
    *
    * Scale note: groupBy + window shuffle on compatible keys —
    * (month,user_id,keyword) then (month,user_id) — so AQE coalesces;
    * the count pre-agg does map-side partial aggregation, and the
    * window input per (month,user) group is tiny (distinct keywords of
    * one user), so the sort never spills. For a pure "argmax" without
    * the rank column, `max_by(keyword, struct(count, keyword))` is a
    * one-shuffle alternative; we keep the window form for parity.
    */
  def mostSearchedKeyword(df: DataFrame, deterministic: Boolean = false): DataFrame = {
    val counts = df.groupBy("month", "user_id", "keyword").count()
    val order =
      if (deterministic) Seq(col("count").desc, col("keyword").asc)
      else Seq(col("count").desc)
    val w = Window.partitionBy("month", "user_id").orderBy(order: _*)
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select("month", "user_id", "keyword")
  }

  /** P12+J2+F4+L1 — split by month, self-join on user, trim keywords,
    * cap at 250 rows (ETL_pipeline.py:160-168). The reference's
    * `limit(250)` takes arbitrary rows; pass `limit = None` for the
    * deterministic full result.
    *
    * The self-join shuffles both sides on user_id; both inputs come
    * from the same window output so they are already hash-partitioned
    * on (month, user_id) — Spark still reshuffles on user_id alone,
    * which is unavoidable without bucketing; each side is ≤1 row per
    * (month,user) so the join is never skewed.
    */
  def monthlySplitJoin(df: DataFrame, month1: Int, month2: Int,
      limit: Option[Int] = Some(250)): DataFrame = {
    def side(m: Int) = df.filter(col("month") === m)
      .withColumnRenamed("keyword", s"most_search_month_$m")
      .select("user_id", s"most_search_month_$m")
    val joined = side(month1).join(side(month2), Seq("user_id"), "inner")
      .withColumn(s"most_search_month_$month1", trim(col(s"most_search_month_$month1")))
      .withColumn(s"most_search_month_$month2", trim(col(s"most_search_month_$month2")))
    limit.fold(joined)(joined.limit)
  }

  /** Scale twin of the faithful split-join trend
    * ([[mostSearchedKeyword]] window → [[monthlySplitJoin]] self-join):
    * ONE aggregation computes both months' argmax keyword per user —
    * `min_by(keyword, struct(-count, keyword))` under a month
    * conditional (null ordering rows are skipped by min_by, so each
    * column sees only its month; the tie-break matches the
    * deterministic window's (count desc, keyword asc)). Two chained
    * aggregations total, no window sort, no self-join — at 100 TB that
    * removes the trend pipeline's join exchange entirely. Inner-join
    * semantics (user must appear in both months) via the not-null
    * filter. Output is identical to the faithful plan (same oracle).
    */
  def trendingFused(search: DataFrame, mapping: DataFrame,
      month1: Int = 6, month2: Int = 7): DataFrame = {
    val c1 = s"most_search_month_$month1"
    val c2 = s"most_search_month_$month2"
    def best(m: Int) = min_by(col("keyword"),
      when(col("month") === m, struct((-col("count")).as("nc"), col("keyword").as("kw"))))
    val fused = filterSearch(search, Seq(month1, month2))
      .groupBy("month", "user_id", "keyword").count()
      .groupBy("user_id")
      .agg(best(month1).as(c1), best(month2).as(c2))
      .filter(col(c1).isNotNull && col(c2).isNotNull)
      .withColumn(c1, trim(col(c1)))
      .withColumn(c2, trim(col(c2)))
    previous(trendingType(searchCategory(fused, mapping, month1, month2)))
  }

  /** J3+P3 — keyword→category lookup, left outer, once per month
    * column (ETL_pipeline.py:170-188). The dim is small (a keyword
    * dictionary), so we broadcast explicitly — the reference leaves it
    * to chance; at 100 TB the fact side must never shuffle for a
    * dictionary join.
    */
  def searchCategory(df: DataFrame, mapping: DataFrame,
      month1: Int = 6, month2: Int = 7): DataFrame = {
    def lookup(d: DataFrame, m: Int) = d.alias("df")
      .join(broadcast(mapping.alias("m")),
        col(s"df.most_search_month_$m") === col("m.search"), "left_outer")
      .select(col("df.*"), col("m.category").as(s"category_t$m"))
    lookup(lookup(df, month1), month2)
  }

  /** F1 — Trending_Type (ETL_pipeline.py:190-192). Null semantics are
    * load-bearing: an unmapped keyword gives null category, and
    * `null == null` is null → `otherwise` → "Changed".
    */
  def trendingType(df: DataFrame): DataFrame =
    df.withColumn("Trending_Type",
      when(col("category_t6") === col("category_t7"), "Unchanged")
        .otherwise("Changed"))

  /** F1+F3 — Previous transition string (ETL_pipeline.py:194-196);
    * `concat_ws` skips null categories, faithful to the reference.
    */
  def previous(df: DataFrame): DataFrame =
    df.withColumn("Previous",
      when(col("category_t6") === col("category_t7"), "Unchanged")
        .otherwise(concat_ws(" -> ", col("category_t6"), col("category_t7"))))
}
