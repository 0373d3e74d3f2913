package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior-branch operator semantics (SURVEY.md §2.3-§2.6, §3.2):
  * null/month filters, top-1 ranking with tie-break, split/self-join,
  * left-join null semantics driving Trending_Type and Previous.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("filterSearch: drops null users/keywords and out-of-range months") {
    val df = Seq(
      (Some(6), Some("u1"), Some("k1")),   // kept
      (Some(7), Some("u1"), Some("k2")),   // kept
      (Some(5), Some("u1"), Some("k1")),   // month out of range
      (Some(6), None, Some("k1")),         // null user
      (Some(6), Some("u2"), None)          // null keyword
    ).toDF("month", "user_id", "keyword")
    rowSet(Behavior.filterSearch(df)) shouldBe Set(
      Seq(6, "u1", "k1"), Seq(7, "u1", "k2"))
  }

  test("mostSearchedKeyword: top count wins; deterministic tie-break on keyword") {
    val df = Seq(
      (6, "u1", "bb"), (6, "u1", "bb"), (6, "u1", "aa"),  // bb count 2 wins
      (6, "u2", "zz"), (6, "u2", "aa"),                   // tie → aa (asc)
      (7, "u1", "cc")
    ).toDF("month", "user_id", "keyword")
    val out = Behavior.mostSearchedKeyword(df, deterministic = true)
    rowSet(out) shouldBe Set(
      Seq(6, "u1", "bb"), Seq(6, "u2", "aa"), Seq(7, "u1", "cc"))
  }

  test("mostSearchedKeyword: exactly one row per (month, user)") {
    val df = Seq(
      (6, "u1", "a"), (6, "u1", "b"), (6, "u1", "c"),
      (7, "u1", "a"), (7, "u1", "a"),
      (6, "u2", "x")).toDF("month", "user_id", "keyword")
    val out = Behavior.mostSearchedKeyword(df, deterministic = true)
    out.groupBy("month", "user_id").count().filter(col("count") =!= 1)
      .count() shouldBe 0L
  }

  test("monthlySplitJoin: inner join keeps only users present in both months; trims") {
    val df = Seq(
      (6, "u1", " k6 "), (7, "u1", "k7"),
      (6, "u2", "only6"),
      (7, "u3", "only7")
    ).toDF("month", "user_id", "keyword")
    val out = Behavior.monthlySplitJoin(df, 6, 7, limit = None)
    out.columns.toSeq shouldBe
      Seq("user_id", "most_search_month_6", "most_search_month_7")
    rowSet(out) shouldBe Set(Seq("u1", "k6", "k7"))
  }

  test("monthlySplitJoin: limit caps output") {
    val df = (1 to 10).flatMap(i => Seq((6, s"u$i", "a"), (7, s"u$i", "b")))
      .toDF("month", "user_id", "keyword")
    Behavior.monthlySplitJoin(df, 6, 7, limit = Some(3)).count() shouldBe 3L
  }

  test("searchCategory: left join attaches categories, miss → null") {
    val df = Seq(("u1", "k6", "k7"), ("u2", "unknown", "k7"))
      .toDF("user_id", "most_search_month_6", "most_search_month_7")
    val mapping = Seq(("k6", "catA"), ("k7", "catB")).toDF("search", "category")
    val out = Behavior.searchCategory(df, mapping)
    rowSet(out.select("user_id", "category_t6", "category_t7")) shouldBe Set(
      Seq("u1", "catA", "catB"),
      Seq("u2", null, "catB"))
  }

  test("trendingType and previous: null category compares as Changed; concat_ws skips nulls") {
    val df = Seq(
      ("u1", Some("catA"), Some("catA")),  // Unchanged
      ("u2", Some("catA"), Some("catB")),  // Changed, "catA -> catB"
      ("u3", None, Some("catB")),          // null == x → null → Changed, "catB"
      ("u4", Option.empty[String], Option.empty[String]) // Changed, ""
    ).toDF("user_id", "category_t6", "category_t7")
    val out = Behavior.previous(Behavior.trendingType(df))
      .select("user_id", "Trending_Type", "Previous")
    rowSet(out) shouldBe Set(
      Seq("u1", "Unchanged", "Unchanged"),
      Seq("u2", "Changed", "catA -> catB"),
      Seq("u3", "Changed", "catB"),
      Seq("u4", "Changed", ""))
  }
}
