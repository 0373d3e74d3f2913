package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.{OrcSink, Sources}
import graft.ops.{AsOfJoin, Behavior, Interaction, Journey, Merge, RangeJoin, Stats, TimeSeries, TopK}

/** SURVEY.md §2 operator inventory re-targeted onto the driver testdata
  * (FIXTURES.md §B): every parity operator gets a named query plus an
  * equivalent DuckDB oracle SQL.
  *
  * Determinism rules (SURVEY.md §7.5 #3): every oracle-compared query
  * carries a total ORDER BY, window ranks carry tie-breakers, and
  * floating-point sums go through `DECIMAL(18,2)` (exact,
  * order-independent) before being cast back to double — double
  * addition is order-dependent across shuffle partitions and would
  * hash-mismatch against the oracle otherwise.
  */
object CoreQueries {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Unique staging dir for the write-then-read-back queries
    * (ORC round-trip, schema merge, partition prune, binary files).
    * Per-INVOCATION so concurrent runs over the same dataset can't
    * race each other's non-atomic Overwrite. Callers pair it with
    * [[releaseStaged]], which deletes the dir EAGERLY once the
    * result is materialized — without it, long-lived sessions (bench
    * reps) would accumulate a full staged copy per invocation until
    * JVM exit. The queue + single JVM-exit hook is only the backstop
    * for invocations that die between stage and release.
    */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      stagedDirs.forEach(d =>
        org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit)))
  }
  private[queries] def stagingDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target", "stagetmp").toAbsolutePath),
      prefix)
    stagedDirs.add(d)
    d.toString
  }

  /** Materialize the (small — these are aggregate/metadata results)
    * frame off its staged files via an eager localCheckpoint, then
    * delete the staging dir immediately. The returned frame no
    * longer references the staged path, so the non-atomic
    * staged-write lifecycle ends inside the invocation instead of at
    * JVM exit. (localCheckpoint blocks are not executor-loss
    * fault-tolerant — fine for these verification-shape queries; a
    * production pipeline would keep its staged lake files.)
    */
  private[queries] def releaseStaged(tmp: String)(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    val p = java.nio.file.Paths.get(tmp)
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    stagedDirs.remove(p)
    out
  }

  // ---- re-targeting of the reference's interaction schema onto `events`
  // (FIXTURES.md §B): Contract→user_id, Mac→props, Date→to_date(ts),
  // AppName→event_type, TotalDuration→value. The junk-contract sentinel
  // "0" maps to user_id 0.
  private val categoryMap = Map(
    "signup" -> "acquisition", "purchase" -> "commerce",
    "view" -> "content", "click" -> "engagement") // "error" recodes to 'error' → dropped
  private val categories = Seq("acquisition", "commerce", "content", "engagement")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** events with the reference-shaped interaction columns. */
  private def interactionInput(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("user_id").as("Contract"),
      col("props").as("Mac"),
      to_date(col("ts")).as("Date"),
      col("event_type").as("AppName"),
      col("value").as("TotalDuration"))

  private val pivotSumsSql: String = Seq(
    "signup" -> "acquisition", "purchase" -> "commerce",
    "view" -> "content", "click" -> "engagement").map { case (t, c) =>
    s"coalesce(CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS $c"
  }.mkString(", ")

  private val categoryPivotSql =
    s"""SELECT user_id, $pivotSumsSql
       |FROM events
       |WHERE user_id <> 0 AND event_type IN ('signup','purchase','view','click')
       |GROUP BY user_id""".stripMargin

  private val activenessSql =
    """SELECT user_id, CASE
      |  WHEN d BETWEEN 1 AND 7 THEN 'very low'
      |  WHEN d BETWEEN 8 AND 14 THEN 'low'
      |  WHEN d BETWEEN 15 AND 21 THEN 'moderate'
      |  WHEN d BETWEEN 22 AND 28 THEN 'high'
      |  WHEN d BETWEEN 29 AND 31 THEN 'very high'
      |  ELSE 'error' END AS activeness
      |FROM (SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS d
      |      FROM events GROUP BY user_id)
      |WHERE d BETWEEN 1 AND 31""".stripMargin

  /** Category pivot on events (recode+filter, agg, pivot, fill 0). */
  private def categoryPivot(s: SparkSession, dir: String): DataFrame = {
    val recoded = Interaction.transformCategory(
      interactionInput(s, dir), categoryMap)
    Interaction.statistics(recoded, categories, c => dsum(col(c)))
  }

  /** Full Customer-360 profile on events (§3.1 end-to-end) via the
    * fused single-pass plan ([[Interaction.fusedProfile]]: one scan +
    * one groupBy replaces pivot ⋈ Activeness ⋈ TotalDevices), then
    * MostWatch, CustomerTaste, exact-quantile segmentation. Exact
    * quantiles (not percentile_approx) so the DuckDB oracle — written
    * against the composed three-aggregate form — reproduces the
    * thresholds bit-for-bit, which also proves the fusion equivalent.
    */
  def customer360(s: SparkSession, dir: String): DataFrame = {
    val profile = Interaction.fusedProfile(
      interactionInput(s, dir), categoryMap, categories,
      sumExpr = c => sum(c.cast("decimal(18,2)")).cast("double"),
      zero = lit(0.0))
    Interaction.customerType(
      Interaction.customerTaste(
        Interaction.mostWatch(profile, categories), categories),
      categories, exactQuantiles = true)
  }

  private val customer360Sql =
    s"""WITH cat AS ($categoryPivotSql),
       |act AS ($activenessSql),
       |dev AS (SELECT user_id, count(DISTINCT props) AS total_devices
       |        FROM events GROUP BY user_id),
       |prof AS (
       |  SELECT cat.user_id, acquisition, commerce, content, engagement,
       |    CASE
       |      WHEN acquisition = greatest(acquisition, commerce, content, engagement) THEN 'acquisition'
       |      WHEN commerce   = greatest(acquisition, commerce, content, engagement) THEN 'commerce'
       |      WHEN content    = greatest(acquisition, commerce, content, engagement) THEN 'content'
       |      WHEN engagement = greatest(acquisition, commerce, content, engagement) THEN 'engagement'
       |    END AS most_watch,
       |    concat_ws('-',
       |      CASE WHEN acquisition <> 0 THEN 'acquisition' END,
       |      CASE WHEN commerce   <> 0 THEN 'commerce' END,
       |      CASE WHEN content    <> 0 THEN 'content' END,
       |      CASE WHEN engagement <> 0 THEN 'engagement' END) AS customer_taste,
       |    activeness, total_devices,
       |    acquisition + commerce + content + engagement AS total_duration
       |  FROM cat
       |  JOIN act USING (user_id)
       |  JOIN dev USING (user_id)),
       |q AS (SELECT quantile_cont(total_duration, 0.25) AS q1,
       |             quantile_cont(total_duration, 0.50) AS med
       |      FROM prof)
       |SELECT user_id, acquisition, commerce, content, engagement,
       |  total_devices, most_watch, customer_taste, activeness,
       |  CASE
       |    WHEN activeness = 'very low' AND total_duration < q1 THEN 'leaving'
       |    WHEN activeness = 'low' AND total_duration < med THEN 'need attention'
       |    WHEN activeness = 'moderate' AND total_duration < med THEN 'normal'
       |    WHEN activeness = 'moderate' AND total_duration >= med THEN 'potential'
       |    WHEN activeness = 'high' AND total_duration > q1 THEN 'loyal'
       |    WHEN activeness = 'very high' AND total_duration > q1 THEN 'VIP'
       |    ELSE 'anomaly' END AS customer_type
       |FROM prof CROSS JOIN q
       |ORDER BY user_id""".stripMargin

  // ---- behavior re-targeting: month→half-of-January "period" 6/7,
  // keyword→props (100 distinct values), user_id→user_id.
  private def searchInput(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      ((dayofmonth(col("ts")) - 1) / 15 + 6).cast("int").as("month"),
      col("user_id"),
      col("props").as("keyword"))

  private val searchInputSql =
    """SELECT CAST((day(ts) - 1) // 15 + 6 AS INT) AS month, user_id,
      |       props AS keyword FROM events""".stripMargin

  private val mostSearchedSql =
    s"""WITH src AS ($searchInputSql),
       |cnt AS (SELECT month, user_id, keyword, count(*) AS cnt
       |        FROM src
       |        WHERE user_id IS NOT NULL AND keyword IS NOT NULL
       |          AND month IN (6, 7)
       |        GROUP BY month, user_id, keyword)
       |SELECT month, user_id, keyword FROM (
       |  SELECT month, user_id, keyword,
       |    row_number() OVER (PARTITION BY month, user_id
       |                       ORDER BY cnt DESC, keyword ASC) AS rnk
       |  FROM cnt)
       |WHERE rnk = 1""".stripMargin

  private def mostSearched(s: SparkSession, dir: String): DataFrame =
    Behavior.mostSearchedKeyword(
      Behavior.filterSearch(searchInput(s, dir)), deterministic = true)

  /** keyword→category dim (J3): a 60-entry literal dictionary covering
    * 60 of the 100 props values, so left-join misses occur. Built from
    * one Seq so the Spark frame and the SQL VALUES stay in lockstep.
    */
  private val mappingRows: Seq[(String, String)] =
    (0 until 60).map(i => (s"""{"k": $i}""", s"cat_${i % 7}"))

  private def mappingDf(s: SparkSession): DataFrame = {
    import s.implicits._
    mappingRows.toDF("search", "category")
  }

  private val mappingValuesSql: String = mappingRows
    .map { case (k, v) => s"('${k.replace("'", "''")}', '$v')" }
    .mkString("(VALUES ", ", ", ")")

  /** The enrich gate's oracle VALUES, generated from the one shared
    * dictionary ([[graft.streaming.StreamingGate.EnrichDict]]) so the
    * SQL can't drift from the gate's dim or the spec's comparator.
    */
  private val enrichDictValuesSql: String =
    graft.streaming.StreamingGate.EnrichDict
      .map { case (c, w) => s"('$c', $w)" }
      .mkString("(VALUES ", ", ", ")")

  private def trendingFull(s: SparkSession, dir: String): DataFrame = {
    val joined = Behavior.monthlySplitJoin(mostSearched(s, dir), 6, 7, limit = None)
    Behavior.previous(Behavior.trendingType(
      Behavior.searchCategory(joined, mappingDf(s))))
  }

  private val trendingSql =
    s"""WITH most AS ($mostSearchedSql),
       |m6 AS (SELECT user_id, trim(keyword) AS most_search_month_6 FROM most WHERE month = 6),
       |m7 AS (SELECT user_id, trim(keyword) AS most_search_month_7 FROM most WHERE month = 7),
       |j AS (SELECT m6.user_id, most_search_month_6, most_search_month_7
       |      FROM m6 JOIN m7 ON m6.user_id = m7.user_id),
       |c AS (SELECT j.*, mt6.category AS category_t6, mt7.category AS category_t7
       |      FROM j
       |      LEFT JOIN $mappingValuesSql AS mt6(search, category) ON j.most_search_month_6 = mt6.search
       |      LEFT JOIN $mappingValuesSql AS mt7(search, category) ON j.most_search_month_7 = mt7.search)
       |SELECT *,
       |  CASE WHEN category_t6 = category_t7 THEN 'Unchanged' ELSE 'Changed' END AS trending_type,
       |  CASE WHEN category_t6 = category_t7 THEN 'Unchanged'
       |       ELSE concat_ws(' -> ', category_t6, category_t7) END AS previous
       |FROM c
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // the query registry
  // ---------------------------------------------------------------------

  val all: Seq[Q] = Seq(

    // A1 — exact distinct devices per contract (ETL_pipeline.py:41-44).
    Q("q_total_devices",
      (s, dir) => Interaction.totalDevices(events(s, dir), "user_id", "props")
        .select(col("user_id"), col("TotalDevices").as("total_devices"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(DISTINCT props) AS total_devices
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A1 scale variant — approx_count_distinct (HLL++): the 100 TB
    // answer to exact distinct's expand+shuffle. The estimate itself is
    // engine-specific, so the FULL oracle pins the error CONTRACT
    // instead: exact count + a within_bound boolean (|est−exact| ≤
    // max(1, 4·rsd·exact)) that DuckDB replays as literal TRUE — any
    // sketch regression flips a row to false and hash-mismatches.
    // The pure estimate face is Interaction.totalDevicesApprox
    // (spec-pinned exact agreement in InteractionSpec).
    Q("q_total_devices_approx",
      (s, dir) => Interaction.totalDevicesApproxCheck(events(s, dir), "user_id", "props")
        .select(col("user_id"),
          col("TotalDevicesExact").as("total_devices_exact"),
          col("WithinBound").as("within_bound"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(DISTINCT props) AS total_devices_exact,
             |  TRUE AS within_bound
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A6 faithful face — percentile_approx with the reference's
    // accuracy=100 (ETL_pipeline.py:113-118). The approx VALUES differ
    // per engine, so the FULL oracle pins the rank-error contract
    // instead: Greenwald-Khanna guarantees rank error ≤ n/accuracy, so
    // each approx quartile must lie between the exact interpolated
    // percentiles at p ± 2/accuracy (doubled to absorb the n-vs-(n−1)
    // rank-convention gap between the bound and percentile_cont).
    // Output = exact quartiles (same values q_quantiles pins) + three
    // booleans DuckDB replays as TRUE.
    Q("q_quantiles_approx",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_approx(l_quantity, array(0.25, 0.5, 0.75), 100)")
            .as("qa"),
          expr("""percentile(l_quantity,
                 array(0.23, 0.25, 0.27, 0.48, 0.50, 0.52, 0.73, 0.75, 0.77))""")
            .as("qe"))
        .select(col("l_returnflag"),
          element_at(col("qe"), 2).as("q1"),
          element_at(col("qe"), 5).as("median"),
          element_at(col("qe"), 8).as("q3"),
          element_at(col("qa"), 1).between(
            element_at(col("qe"), 1), element_at(col("qe"), 3)).as("q1_ok"),
          element_at(col("qa"), 2).between(
            element_at(col("qe"), 4), element_at(col("qe"), 6)).as("median_ok"),
          element_at(col("qa"), 3).between(
            element_at(col("qe"), 7), element_at(col("qe"), 9)).as("q3_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.25) AS q1,
             |  quantile_cont(l_quantity, 0.50) AS median,
             |  quantile_cont(l_quantity, 0.75) AS q3,
             |  TRUE AS q1_ok, TRUE AS median_ok, TRUE AS q3_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A1 incremental — mergeable DataSketches HLL per (user, day),
    // unioned back to a range-wide distinct estimate. Sketch binaries
    // are engine-specific, so the FULL oracle pins the merge contract:
    // union of per-day sketches must estimate the range-wide distinct
    // within the sketch's documented rsd (lgConfigK=12 → 4σ ≈ 6.5%,
    // min 1 absolute) — exact count + within_bound TRUE per row.
    Q("q_hll_merge",
      (s, dir) => Interaction.mergeDeviceSketchesCheck(
          events(s, dir), "user_id", "props", grain = to_date(col("ts")))
        .select(col("user_id"),
          col("TotalDevicesExact").as("total_devices_exact"),
          col("WithinBound").as("within_bound"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(DISTINCT props) AS total_devices_exact,
             |  TRUE AS within_bound
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A2+F1+P14 — activeness buckets over distinct active days (:46-60).
    Q("q_activeness",
      (s, dir) => Interaction.activeness(
          events(s, dir).withColumn("Date", to_date(col("ts"))), "user_id", "Date")
        .select(col("user_id"), col("Activeness").as("activeness"))
        .orderBy("user_id"),
      Some(activenessSql + "\nORDER BY user_id")),

    // F1+P8+A3+A4 — recode, junk filters, two-phase agg + pivot (:63-86).
    Q("q_category_pivot",
      (s, dir) => categoryPivot(s, dir)
        .withColumnRenamed("Contract", "user_id")
        .orderBy("user_id"),
      Some(categoryPivotSql + "\nORDER BY user_id")),

    // F1+F2 — greatest() argmax over pivot columns (:88-96).
    Q("q_most_watch",
      (s, dir) => Interaction.mostWatch(categoryPivot(s, dir), categories)
        .select(col("Contract").as("user_id"), col("MostWatch").as("most_watch"))
        .orderBy("user_id"),
      Some(s"""WITH cat AS ($categoryPivotSql)
              |SELECT user_id, CASE
              |  WHEN acquisition = greatest(acquisition, commerce, content, engagement) THEN 'acquisition'
              |  WHEN commerce   = greatest(acquisition, commerce, content, engagement) THEN 'commerce'
              |  WHEN content    = greatest(acquisition, commerce, content, engagement) THEN 'content'
              |  WHEN engagement = greatest(acquisition, commerce, content, engagement) THEN 'engagement'
              |  END AS most_watch
              |FROM cat ORDER BY user_id""".stripMargin)),

    // F1+F3 — null-skipping concat_ws taste string (:98-107).
    Q("q_customer_taste",
      (s, dir) => Interaction.customerTaste(categoryPivot(s, dir), categories)
        .select(col("Contract").as("user_id"), col("CustomerTaste").as("customer_taste"))
        .orderBy("user_id"),
      Some(s"""WITH cat AS ($categoryPivotSql)
              |SELECT user_id, concat_ws('-',
              |  CASE WHEN acquisition <> 0 THEN 'acquisition' END,
              |  CASE WHEN commerce   <> 0 THEN 'commerce' END,
              |  CASE WHEN content    <> 0 THEN 'content' END,
              |  CASE WHEN engagement <> 0 THEN 'engagement' END) AS customer_taste
              |FROM cat ORDER BY user_id""".stripMargin)),

    // §3.1 end-to-end — J1 joins + A6 quantile segmentation (:110-145,285-289).
    Q("q_customer360",
      (s, dir) => customer360(s, dir)
        .select(col("Contract").as("user_id"),
          col("acquisition"), col("commerce"), col("content"), col("engagement"),
          col("TotalDevices").as("total_devices"),
          col("MostWatch").as("most_watch"),
          col("CustomerTaste").as("customer_taste"),
          col("Activeness").as("activeness"),
          col("CustomerType").as("customer_type"))
        .orderBy("user_id"),
      Some(customer360Sql)),

    // A5+W1+P11 — most-searched keyword per (month,user), deterministic
    // tie-break (:153-158).
    Q("q_most_searched",
      (s, dir) => mostSearched(s, dir).orderBy("month", "user_id"),
      Some(mostSearchedSql + "\nORDER BY month, user_id")),

    // P12+J2+F4 — per-month split + self-join on user (:160-168); the
    // reference's limit(250) is dropped here for determinism (L1 is
    // covered by q_zip_join's ordered limit).
    Q("q_period_join",
      (s, dir) => Behavior.monthlySplitJoin(mostSearched(s, dir), 6, 7, limit = None)
        .orderBy("user_id"),
      Some(s"""WITH most AS ($mostSearchedSql),
              |m6 AS (SELECT user_id, trim(keyword) AS most_search_month_6 FROM most WHERE month = 6),
              |m7 AS (SELECT user_id, trim(keyword) AS most_search_month_7 FROM most WHERE month = 7)
              |SELECT m6.user_id AS user_id, most_search_month_6, most_search_month_7
              |FROM m6 JOIN m7 ON m6.user_id = m7.user_id
              |ORDER BY m6.user_id""".stripMargin)),

    // J3+P3+F1+F3 — broadcast dictionary left-joins ×2, Trending_Type,
    // Previous (:170-196).
    Q("q_trending",
      (s, dir) => trendingFull(s, dir)
        .select(col("user_id"), col("most_search_month_6"),
          col("most_search_month_7"), col("category_t6"), col("category_t7"),
          col("Trending_Type").as("trending_type"),
          col("Previous").as("previous"))
        .orderBy("user_id"),
      Some(trendingSql)),

    // Trend scale twin — Behavior.trendingFused: both months' argmax in
    // one aggregation pass (min_by under a month conditional), no
    // window, no self-join. Same oracle as the faithful q_trending —
    // which is the equivalence proof.
    Q("q_trending_fused",
      (s, dir) => Behavior.trendingFused(searchInput(s, dir), mappingDf(s))
        .select(col("user_id"), col("most_search_month_6"),
          col("most_search_month_7"), col("category_t6"), col("category_t7"),
          col("Trending_Type").as("trending_type"),
          col("Previous").as("previous"))
        .orderBy("user_id"),
      Some(trendingSql)),

    // J4 deterministic — ordered 250-row zip-join of the two branches'
    // stand-ins (:356-362; nondeterministic faithful variant covered by
    // ScalaTest only, SURVEY.md §7.5 #3).
    Q("q_zip_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Merge.zipJoinDeterministic(
            c, Seq(col("c_custkey")), o, Seq(col("o_orderkey")),
            limit = Some(250), dropCols = Seq.empty)
          .orderBy("c_custkey")
      },
      Some("""WITH l AS (SELECT c_custkey, c_name, c_mktsegment,
             |  row_number() OVER (ORDER BY c_custkey) AS idx
             |  FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 250)),
             |r AS (SELECT o_orderkey, o_totalprice,
             |  row_number() OVER (ORDER BY o_orderkey) AS idx
             |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 250))
             |SELECT c_custkey, c_name, c_mktsegment, o_orderkey, o_totalprice
             |FROM l JOIN r USING (idx) ORDER BY c_custkey""".stripMargin)),

    // U1 — unionByName with reordered columns ≡ the whole table (:256-260).
    Q("q_union_by_name",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val a = li.filter(col("l_linenumber") <= 3)
          .select("l_orderkey", "l_returnflag", "l_quantity")
        val b = li.filter(col("l_linenumber") > 3)
          .select("l_quantity", "l_orderkey", "l_returnflag") // reordered on purpose
        a.unionByName(b)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ORC round-trip: write a lineitem slice through the OrcSink, read
    // it back via Sources.readOrc with a pushdown-eligible predicate,
    // and aggregate — proves write/read fidelity for the ORC half of
    // the columnar-lake surface (oracle runs the same aggregate over
    // the original parquet rows).
    Q("q_orc_roundtrip",
      (s, dir) => {
        val tmp = stagingDir("graft_orc_")
        OrcSink(tmp).write(Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        releaseStaged(tmp)(Sources.readOrc(s, Seq(tmp))
          .filter(col("l_quantity") > 25)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem WHERE l_quantity > 25
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Schema evolution: two parquet slices with DIFFERENT schemas (the
    // second adds l_quantity) read back through mergeSchema — the
    // lake's added-a-column-last-month reality. Old rows surface the
    // new column as null; the aggregate proves both the union and the
    // null semantics (oracle replays the slice split over the source
    // rows).
    Q("q_merge_schema",
      (s, dir) => {
        val tmp = stagingDir("graft_ms_")
        val li = Tables(s, dir, "lineitem")
        li.filter(col("l_linenumber") <= 3)
          .select("l_orderkey", "l_returnflag")
          .write.mode("overwrite").parquet(s"$tmp/v1")
        li.filter(col("l_linenumber") > 3)
          .select("l_orderkey", "l_returnflag", "l_quantity")
          .write.mode("overwrite").parquet(s"$tmp/v2")
        releaseStaged(tmp)(s.read.option("mergeSchema", "true")
          .parquet(s"$tmp/v1", s"$tmp/v2")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            count(col("l_quantity")).as("n_with_qty"),
            dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n_rows,
              |  count(CASE WHEN l_linenumber > 3 THEN 1 END) AS n_with_qty,
              |  CAST(SUM(CASE WHEN l_linenumber > 3
              |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty
              |FROM lineitem GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    // S4's scale path under the driver gate: date-partitioned write +
    // range-pruned read (the predicate prunes at the file index — the
    // PartitionFilters assert lives in SourcesSinksSpec; here the
    // surviving rows must equal the batch date filter).
    Q("q_partition_prune",
      (s, dir) => {
        val tmp = stagingDir("graft_pp_")
        val ev = Tables(s, dir, "events")
          .withColumn("date", date_format(to_date(col("ts")), "yyyyMMdd").cast("int"))
        graft.io.PartitionedParquetSink(tmp).write(
          ev.select("date", "event_id", "user_id", "event_type", "value"))
        releaseStaged(tmp)(
          Sources.readDatePartitioned(s, tmp, 20240108, 20240114)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
            .orderBy("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS n,
              |  ${dsumSql("value")} AS sum_value
              |FROM events
              |WHERE CAST(strftime(ts, '%Y%m%d') AS INT) BETWEEN 20240108 AND 20240114
              |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // A7 deterministic — dropDuplicates(subset) as rank-1-per-key (:302).
    Q("q_drop_duplicates",
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy("p_partkey")
        Tables(s, dir, "part")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select("p_brand", "p_partkey", "p_name")
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, p_partkey, p_name FROM (
             |  SELECT p_brand, p_partkey, p_name,
             |    row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rnk
             |  FROM part)
             |WHERE rnk = 1 ORDER BY p_brand""".stripMargin)),

    // P8-P14 — the reference's filter repertoire (≠, IS NOT NULL, IN,
    // BETWEEN, conjunction) pushed onto one scan (:73-74,149-150,136-141).
    Q("q_filter_ops",
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") =!= "A")
        .filter(col("l_shipdate").isNotNull)
        .filter(col("l_linenumber").isin(1, 2, 3))
        .filter(col("l_quantity").between(10, 40))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_linestatus"),
      Some(s"""SELECT l_linestatus, count(*) AS n,
              |  ${dsumSql("l_extendedprice")} AS sum_price
              |FROM lineitem
              |WHERE l_returnflag <> 'A' AND l_shipdate IS NOT NULL
              |  AND l_linenumber IN (1, 2, 3) AND l_quantity BETWEEN 10 AND 40
              |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // A6 — exact interpolated quantiles per group (the oracle-safe face
    // of percentile_approx, :113-123; integral doubles → interpolation
    // exact in both engines).
    Q("q_quantiles",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.50)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q3"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.25) AS q1,
             |  quantile_cont(l_quantity, 0.50) AS median,
             |  quantile_cont(l_quantity, 0.75) AS q3
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // W1/L3 — top-3 per group with full tie-break. Plain window: at
    // bench scale the scan dominates and the 3-group sort is cheap;
    // TopK.topKPerGroup is the pre-pruned variant for groups too large
    // to sort in one task (equivalence asserted in TopKSpec).
    Q("q_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        Tables(s, dir, "lineitem")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("l_returnflag", "rnk", "l_orderkey", "l_linenumber",
            "l_extendedprice")
          .orderBy("l_returnflag", "rnk")
      },
      Some("""SELECT l_returnflag, rnk, l_orderkey, l_linenumber, l_extendedprice
             |FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey ASC,
             |               l_linenumber ASC) AS INT) AS rnk
             |  FROM lineitem)
             |WHERE rnk <= 3 ORDER BY l_returnflag, rnk""".stripMargin)),

    // L3 scale path — TopK.topKPerGroup: partition-local sort + prune
    // BEFORE the window shuffle, so only ≤ partitions·k rows per group
    // reach the global sort (the at-100× answer to q_window_rank's
    // whole-table window; equivalence also pinned in TopKSpec). Same
    // oracle shape as q_window_rank at k=5.
    Q("q_topk_pruned",
      (s, dir) => TopK.topKPerGroup(
          Tables(s, dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc),
          k = 5)
        .select("l_returnflag", "rnk", "l_orderkey", "l_linenumber",
          "l_extendedprice")
        .orderBy("l_returnflag", "rnk"),
      Some("""SELECT l_returnflag, rnk, l_orderkey, l_linenumber, l_extendedprice
             |FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey ASC,
             |               l_linenumber ASC) AS INT) AS rnk
             |  FROM lineitem)
             |WHERE rnk <= 5 ORDER BY l_returnflag, rnk""".stripMargin)),

    // Skew-safe equi-join — SkewJoin.saltedJoin: the hot key spreads
    // over `salts` tasks (skewed side salted, build side replicated);
    // output is identical to the plain join for ANY salt assignment,
    // which is exactly what the oracle (plain join) checks.
    Q("q_salted_join",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
          .withColumnRenamed("o_custkey", "c_custkey")
        val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
        graft.ops.SkewJoin.saltedJoin(orders, cust, Seq("c_custkey"), salts = 8)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_nationkey")
      },
      Some(s"""SELECT c_nationkey, count(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Bucket-co-located join — the static scale answer to the
    // fact-fact shuffle: both sides written bucketBy(8, custkey) +
    // sortBy into the catalog (writeBucketed single-files each bucket,
    // which is what lets the scan report its sort order), then
    // sort-merge-joined with ZERO
    // Exchange and ZERO Sort (executed-plan shape pinned in BucketedSpec; the
    // 64 MB broadcast threshold is bypassed with hint("merge") so
    // the BUCKETS carry the join, as they would at fact-fact scale).
    // Result ≡ the plain join — which is exactly what the oracle
    // replays. Tables are dropped after an eager checkpoint of the
    // small aggregate, so catalog/warehouse state ends with the
    // invocation.
    Q("q_bucketed_join",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "_")
        val ot = s"orders_bkt_$tag"
        val ct = s"cust_bkt_$tag"
        // both writes INSIDE the try: if the second write (or the
        // join) fails, the finally still drops whichever tables exist
        try {
          graft.ops.Bucketed.writeBucketed(
            Tables(s, dir, "orders").select("o_custkey", "o_totalprice"),
            ot, buckets = 8, keys = Seq("o_custkey"))
          graft.ops.Bucketed.writeBucketed(
            Tables(s, dir, "customer").select("c_custkey", "c_mktsegment"),
            ct, buckets = 8, keys = Seq("c_custkey"))
          graft.ops.Bucketed.coLocatedJoin(s, ot, ct, "o_custkey", "c_custkey")
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n_orders"),
              dsum(col("o_totalprice")).as("sum_price"))
            .orderBy("c_mktsegment")
            .localCheckpoint(true)
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $ot")
          s.sql(s"DROP TABLE IF EXISTS $ct")
        }
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Join-family completeness beyond the reference surface: FULL
    // OUTER (both unmatched sides kept — count(col) skips the nulls
    // each side contributes) aggregated per segment so the output is
    // small and total-ordered.
    Q("q_full_outer",
      (s, dir) => Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "full_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(col("c_custkey")).as("n_cust_rows"))
        .orderBy("segment"),
      Some("""SELECT coalesce(c_mktsegment, 'NO_CUSTOMER') AS segment,
             |  count(o_orderkey) AS n_orders, count(c_custkey) AS n_cust_rows
             |FROM orders FULL JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY segment""".stripMargin)),

    // LEFT ANTI as a first-class registry face (the dedup family uses
    // it internally): customers with no high-value order (every
    // customer has SOME order in this data, so the unrestricted
    // anti-join would be an empty — weak — check; the filter pushes
    // into the right-side scan before the anti semi-shuffle).
    Q("q_anti_join",
      (s, dir) => Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders")
            .filter(col("o_totalprice") > 250000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
             |ORDER BY c_custkey""".stripMargin)),

    // J1 — fact ⋈ broadcast dim + agg (:285-286 shape on TPC-H).
    Q("q_join_agg",
      (s, dir) => Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment"),
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS revenue
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Event-time tumbling window (batch face of
    // streaming.Streaming.windowedCategoryStats): daily windows via
    // window(), which DuckDB reproduces with date_trunc.
    Q("q_tumbling_window",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("total_value"), col("n_events"))
        .orderBy("window_start", "event_type"),
      Some(s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
              |  ${dsumSql("value")} AS total_value, count(*) AS n_events
              |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // F-family: semi-structured extraction — get_json_object +
    // from_json over the JSON-shaped props column, aggregated per
    // extracted key. DuckDB twins via json_extract.
    Q("q_json_extract",
      (s, dir) => Tables(s, dir, "events")
        .select(
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k2"),
          col("value"))
        .filter(col("k") === col("k2")) // both extraction paths agree
        .groupBy("k")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("k"),
      Some(s"""SELECT CAST(json_extract(props, '$$.k') AS INT) AS k,
              |  count(*) AS n, ${dsumSql("value")} AS total
              |FROM events GROUP BY k ORDER BY k""".stripMargin)),

    // W-family breadth: lag/lead/ntile/cume_dist over a keyed ordered
    // window — the offset/distribution functions the rank queries
    // don't touch. Total tie-break order (ts, event_id... ts alone is
    // not unique) via (ts, value) then event fields.
    Q("q_window_funcs",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("value").asc, col("event_type").asc)
        Tables(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("ts"), col("value"), col("event_type"))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .orderBy("user_id", "ts", "value", "event_type")
      },
      Some("""SELECT user_id, ts, value, event_type,
             |  lag(value, 1) OVER w AS prev_value,
             |  lead(event_type, 1) OVER w AS next_type,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  round(cume_dist() OVER w, 6) AS cume
             |FROM events
             |WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id
             |  ORDER BY ts ASC, value ASC, event_type ASC)
             |ORDER BY user_id, ts, value, event_type""".stripMargin)),

    // Sliding event-time windows (1 h size, 30 min slide): each event
    // lands in exactly size/slide = 2 windows. DuckDB reproduces the
    // epoch-aligned window starts with integer epoch arithmetic
    // (start ∈ {floor(t/1800)·1800, that − 1800}).
    Q("q_sliding_window",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("total_value"), col("n_events"))
        .orderBy("window_start", "event_type"),
      Some(s"""WITH slid AS (
              |  SELECT event_type, value,
              |    make_timestamp((floor(epoch(ts))::BIGINT // 1800 * 1800 - off) * 1000000) AS window_start
              |  FROM events CROSS JOIN (VALUES (0), (1800)) AS o(off))
              |SELECT window_start, event_type,
              |  ${dsumSql("value")} AS total_value, count(*) AS n_events
              |FROM slid GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Event-time session windows (batch face of
    // streaming.Streaming.sessionWatch): session_window(gap) ≡ the SQL
    // gaps-and-islands pattern — break when the gap to the previous
    // event is ≥ 30 min (Spark merges only strictly-overlapping
    // windows), session end = last ts + gap.
    Q("q_session_window",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sess"), col("user_id"))
        .agg(dsum(col("value")).as("total_value"), count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sess.start").as("session_start"),
          col("sess.end").as("session_end"), col("total_value"), col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |  count(*) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Top-20 session paths: 30-min-gap sessions, first 8 event types
    // joined by '>' — flow mining over the same break rule as
    // q_session_window. One user-key shuffle + path count +
    // TakeOrdered.
    Q("q_top_paths",
      (s, dir) => Journey.topPaths(Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_type"), col("event_id")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g),
             |p AS (SELECT user_id, sid,
             |    array_to_string(list_slice(
             |      list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path
             |  FROM s GROUP BY 1, 2)
             |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
             |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    // Strictly-ordered funnel (signup → view → purchase): greedy
    // earliest chain per user ≡ the sequential-min-CTE definition the
    // oracle spells out. One shuffle on the user key; outputs are
    // exact integers (counts + microsecond delay sums), so the compare
    // is float-free.
    Q("q_funnel",
      (s, dir) => Journey.funnel(Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "view", "purchase")),
      Some("""WITH t0 AS (SELECT user_id, min(ts) AS r FROM events
             |        WHERE event_type = 'signup' GROUP BY 1),
             |t1 AS (SELECT e.user_id, min(e.ts) AS r FROM events e
             |        JOIN t0 ON e.user_id = t0.user_id
             |        WHERE e.event_type = 'view' AND e.ts > t0.r GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(e.ts) AS r FROM events e
             |        JOIN t1 ON e.user_id = t1.user_id
             |        WHERE e.event_type = 'purchase' AND e.ts > t1.r GROUP BY 1)
             |SELECT * FROM (
             |  SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step, count(*) AS n_users,
             |    CAST(CASE WHEN count(*) = 0 THEN NULL ELSE 0 END AS BIGINT) AS total_delay_us
             |  FROM t0
             |  UNION ALL
             |  SELECT CAST(1 AS INT), 'view', count(*),
             |    CAST(sum(epoch_us(t1.r) - epoch_us(t0.r)) AS BIGINT)
             |  FROM t1 JOIN t0 ON t1.user_id = t0.user_id
             |  UNION ALL
             |  SELECT CAST(2 AS INT), 'purchase', count(*),
             |    CAST(sum(epoch_us(t2.r) - epoch_us(t1.r)) AS BIGINT)
             |  FROM t2 JOIN t1 ON t2.user_id = t1.user_id)
             |ORDER BY step_idx""".stripMargin)),

    // Time-bounded funnel: each step must land within 6 h of the
    // previous step's completion ("convert within T"). Same greedy
    // chain ≡ sequential-min equivalence, with the window as an extra
    // conjunct on both sides.
    Q("q_funnel_window",
      (s, dir) => Journey.funnel(Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "view", "purchase"), maxStepGapSec = Some(21600L)),
      Some("""WITH t0 AS (SELECT user_id, min(ts) AS r FROM events
             |        WHERE event_type = 'signup' GROUP BY 1),
             |t1 AS (SELECT e.user_id, min(e.ts) AS r FROM events e
             |        JOIN t0 ON e.user_id = t0.user_id
             |        WHERE e.event_type = 'view' AND e.ts > t0.r
             |          AND epoch_us(e.ts) - epoch_us(t0.r) <= 21600000000 GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(e.ts) AS r FROM events e
             |        JOIN t1 ON e.user_id = t1.user_id
             |        WHERE e.event_type = 'purchase' AND e.ts > t1.r
             |          AND epoch_us(e.ts) - epoch_us(t1.r) <= 21600000000 GROUP BY 1)
             |SELECT * FROM (
             |  SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step, count(*) AS n_users,
             |    CAST(CASE WHEN count(*) = 0 THEN NULL ELSE 0 END AS BIGINT) AS total_delay_us
             |  FROM t0
             |  UNION ALL
             |  SELECT CAST(1 AS INT), 'view', count(*),
             |    CAST(sum(epoch_us(t1.r) - epoch_us(t0.r)) AS BIGINT)
             |  FROM t1 JOIN t0 ON t1.user_id = t0.user_id
             |  UNION ALL
             |  SELECT CAST(2 AS INT), 'purchase', count(*),
             |    CAST(sum(epoch_us(t2.r) - epoch_us(t1.r)) AS BIGINT)
             |  FROM t2 JOIN t1 ON t2.user_id = t1.user_id)
             |ORDER BY step_idx""".stripMargin)),

    // Weekly cohort retention: cohort = Monday-truncated week of the
    // user's first event; active-at-offset from the user's distinct
    // activity weeks. Log collapses in ONE user-key shuffle; retention
    // is a single int/int division (engine-stable), not a float sum.
    Q("q_retention",
      (s, dir) => Journey.cohortRetention(Tables(s, dir, "events"),
        col("user_id"), col("ts")),
      Some("""WITH uw AS (SELECT DISTINCT user_id,
             |        CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY 1),
             |a AS (SELECT u.user_id, c.cohort,
             |        CAST(datediff('day', c.cohort, u.wk) // 7 AS INT) AS week_offset
             |      FROM uw u JOIN c ON u.user_id = c.user_id),
             |r AS (SELECT cohort, week_offset, count(*) AS n_active
             |      FROM a GROUP BY 1, 2),
             |s AS (SELECT cohort, n_active AS cohort_size FROM r WHERE week_offset = 0)
             |SELECT r.cohort, r.week_offset, r.n_active, s.cohort_size,
             |  round(r.n_active / s.cohort_size, 6) AS retention
             |FROM r JOIN s ON r.cohort = s.cohort
             |ORDER BY r.cohort, r.week_offset""".stripMargin)),

    // U-family inverse of A4: unpivot (melt) the per-user category
    // pivot back to long form — Spark's native unpivot vs DuckDB's
    // SQL-standard UNPIVOT. Nulls are filled to 0 on both sides first
    // (the two engines disagree on dropping NULL measures).
    Q("q_unpivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables(s, dir, "events")
          .groupBy("user_id").pivot("event_type", types)
          .agg(dsum(col("value")))
          .na.fill(0.0, types)
          .unpivot(Array(col("user_id")), types.map(col).toArray,
            "event_type", "total_value")
          .orderBy("user_id", "event_type")
      },
      Some(s"""WITH p AS (SELECT user_id,
              |  ${Seq("click", "error", "purchase", "signup", "view").map(t =>
                   s"coalesce(CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS $t")
                   .mkString(",\n              |  ")}
              |  FROM events GROUP BY user_id)
              |SELECT user_id, event_type, total_value
              |FROM p UNPIVOT (total_value FOR event_type IN (click, error, purchase, signup, view))
              |ORDER BY user_id, event_type""".stripMargin)),

    // Per-key trailing-hour moving aggregate via a TIME-range window
    // frame (RANGE, not ROWS — equal-ts peers share frames, and the
    // frame is by event time, not row count). Sum in DECIMAL(18,2).
    Q("q_moving_agg",
      (s, dir) => TimeSeries.movingAgg(
          Tables(s, dir, "events").filter(col("user_id") < 20),
          col("user_id"), col("ts"), col("value"), windowSec = 3600L)
        .select("user_id", "ts", "event_id", "moving_sum", "moving_n")
        .orderBy("user_id", "ts", "event_id"),
      Some("""SELECT user_id, ts, event_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum,
             |  count(*) OVER w AS moving_n
             |FROM events WHERE user_id < 20
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts, event_id""".stripMargin)),

    // Burst debounce: drop events < 5 min after the key's previous
    // event ((ts, event_id) order) — lag-based duplicate/retry
    // collapse, one key shuffle.
    Q("q_debounce",
      (s, dir) => TimeSeries.debounce(Tables(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"), minGapSec = 300L)
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "ts", "event_id"),
      Some("""SELECT user_id, ts, event_id, event_type FROM (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(ts, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events)
             |WHERE prev IS NULL OR epoch_us(ts) - epoch_us(prev) >= 300000000
             |ORDER BY user_id, ts, event_id""".stripMargin)),

    // Daily gap-fill + forward-fill: densify each event_type's daily
    // value series over its [first, last] day span, carrying the last
    // observed value across silent days (filled = true). The fill
    // rides the lead+sequence explode — no date-dimension join.
    Q("q_gap_fill",
      (s, dir) => TimeSeries.gapFill(Tables(s, dir, "events"),
          "event_type", col("ts"), col("value"))
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS obs,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT event_type, obs, value,
             |    lead(obs) OVER (PARTITION BY event_type ORDER BY obs) AS nxt
             |  FROM daily)
             |SELECT event_type, CAST(d AS DATE) AS day, value,
             |  CAST(d AS DATE) <> obs AS filled
             |FROM (SELECT event_type, obs, value,
             |    unnest(generate_series(CAST(obs AS TIMESTAMP),
             |      CAST(coalesce(nxt - 1, obs) AS TIMESTAMP),
             |      INTERVAL 1 DAY)) AS d
             |  FROM g)
             |ORDER BY event_type, day""".stripMargin)),

    // First-order event transition matrix (user-flow / Sankey): counts
    // and per-source shares of consecutive event-type pairs.
    Q("q_transitions",
      (s, dir) => Journey.transitionMatrix(Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_type"), col("event_id")),
      Some("""WITH s AS (SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT from_type, to_type, count(*) AS n FROM s
             |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  round(n / (sum(n) OVER (PARTITION BY from_type)), 6) AS share
             |FROM c ORDER BY from_type, to_type""".stripMargin)),

    // Per-group Pearson correlation from EXACT integer-scaled moment
    // sums (Spark's corr() accumulates doubles order-dependently —
    // unreproducible and un-oracle-able; the moment sums are exact,
    // commutative, and map-side-combinable). Final O(1) formula in
    // double, identical op order both engines, round(…, 6).
    Q("q_corr",
      (s, dir) => Stats.corrBy(Tables(s, dir, "lineitem"),
          Seq("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_returnflag"),
      Some(s"""WITH m AS (SELECT l_returnflag, count(xi) AS n,
              |    sum(xi) AS sx, sum(yi) AS sy, sum(xi*xi) AS sxx,
              |    sum(yi*yi) AS syy, sum(xi*yi) AS sxy
              |  FROM (SELECT l_returnflag,
              |      CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              |        THEN CAST(round(l_quantity * 1000000.0) AS HUGEINT) END AS xi,
              |      CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              |        THEN CAST(round(l_extendedprice * 1000000.0) AS HUGEINT) END AS yi
              |    FROM lineitem) GROUP BY 1),
              |d AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
              |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
              |    CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
              |    CAST(sxy AS DOUBLE) AS sxy
              |  FROM m)
              |SELECT l_returnflag, n,
              |  CASE WHEN nd*sxx - sx*sx > 0 AND nd*syy - sy*sy > 0 THEN
              |    round((nd*sxy - sx*sy) / sqrt(nd*sxx - sx*sx) / sqrt(nd*syy - sy*sy), 6)
              |  END AS corr
              |FROM d ORDER BY l_returnflag""".stripMargin)),

    // Per-group least-squares fit (y = value over x = hour-of-day)
    // from the same exact-moment machinery.
    Q("q_linear_fit",
      (s, dir) => Stats.linearFitBy(Tables(s, dir, "events"),
          Seq("event_type"), hour(col("ts")).cast("double"), col("value"))
        .orderBy("event_type"),
      Some("""WITH m AS (SELECT event_type, count(xi) AS n,
             |    sum(xi) AS sx, sum(yi) AS sy, sum(xi*xi) AS sxx,
             |    sum(yi*yi) AS syy, sum(xi*yi) AS sxy
             |  FROM (SELECT event_type,
             |      CASE WHEN ts IS NOT NULL AND value IS NOT NULL
             |        THEN CAST(round(CAST(hour(ts) AS DOUBLE) * 1000000.0) AS HUGEINT) END AS xi,
             |      CASE WHEN ts IS NOT NULL AND value IS NOT NULL
             |        THEN CAST(round(value * 1000000.0) AS HUGEINT) END AS yi
             |    FROM events) GROUP BY 1),
             |d AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
             |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
             |    CAST(sxx AS DOUBLE) AS sxx, CAST(sxy AS DOUBLE) AS sxy
             |  FROM m)
             |SELECT event_type, n,
             |  CASE WHEN nd*sxx - sx*sx > 0 THEN
             |    round((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 6) END AS slope,
             |  CASE WHEN nd*sxx - sx*sx > 0 THEN
             |    round((sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd / 1000000.0, 6)
             |  END AS intercept
             |FROM d ORDER BY event_type""".stripMargin)),

    // Per-group population stddev, exact-moment path (same rationale
    // as q_corr: built-in stddev is order-dependent).
    Q("q_stddev",
      (s, dir) => Stats.stddevPopBy(Tables(s, dir, "events"),
          Seq("event_type"), col("value"))
        .orderBy("event_type"),
      Some("""WITH m AS (SELECT event_type, count(xi) AS n,
             |    sum(xi) AS sx, sum(xi*xi) AS sxx
             |  FROM (SELECT event_type,
             |      CAST(round(value * 1000000.0) AS HUGEINT) AS xi
             |    FROM events) GROUP BY 1)
             |SELECT event_type, n,
             |  round(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) / 1000000.0, 6) AS stddev_pop
             |FROM m ORDER BY event_type""".stripMargin)),

    // Daily-volume anomaly detection: per-type daily counts z-scored
    // against the trailing 7 observed days (exact integer baseline
    // sums; z null until a full baseline / zero variance).
    Q("q_anomaly",
      (s, dir) => TimeSeries.volumeAnomaly(Tables(s, dir, "events"),
          "event_type", col("ts"), trailing = 7)
        .orderBy("event_type", "day"),
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT event_type, day, n,
             |    count(*) OVER w AS cnt,
             |    sum(n) OVER w AS sx,
             |    sum(n * n) OVER w AS sxx
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day, n,
             |  CASE WHEN cnt = 7 AND CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
             |    round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE))
             |      / (sqrt(CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |         / CAST(cnt AS DOUBLE)), 6)
             |  END AS z
             |FROM b ORDER BY event_type, day""".stripMargin)),

    // Per-group min-max feature scaling: value → [0,1] within its
    // event type; group stats broadcast back, corpus never shuffled.
    Q("q_minmax_norm",
      (s, dir) => Stats.minMaxNormalizeBy(
          Tables(s, dir, "events").filter(col("value").isNotNull)
            .select("event_id", "event_type", "value"),
          Seq("event_type"), col("value"), "value")
        .select("event_id", "event_type", "value", "value_norm")
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type, value,
             |  CASE WHEN mx > mn THEN round((value - mn) / (mx - mn), 6) END AS value_norm
             |FROM (SELECT event_id, event_type, value,
             |    min(value) OVER (PARTITION BY event_type) AS mn,
             |    max(value) OVER (PARTITION BY event_type) AS mx
             |  FROM events WHERE value IS NOT NULL)
             |ORDER BY event_id""".stripMargin)),

    // STATEFUL STREAMING under the hard gate: a real Structured
    // Streaming run (file source micro-batches → flatMapGroupsWithState
    // emit-on-close sessions → foreachBatch), with time-ordered staging
    // + sentinel batches making watermark progression deterministic
    // (graft.streaming.StreamingGate). Closed sessions must equal the
    // batch gaps-and-islands sessionization — the same oracle family as
    // q_session_window, with duration = floor(value) for exact integer
    // sums. This puts the state machine, watermark advancement, and
    // event-time timeouts under the DuckDB hash gate, not just specs.
    Q("q_closed_sessions",
      (s, dir) => graft.streaming.StreamingGate.closedSessionsFromFiles(s, dir),
      Some("""WITH g AS (
             |  SELECT user_id, ts, CAST(floor(value) AS BIGINT) AS dur,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  CAST(SUM(dur) AS BIGINT) AS total_duration,
             |  CAST(count(*) AS INT) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // The SAME session machine on Spark 4's transformWithState
    // (StatefulProcessor + explicit event-time timers, RocksDB state
    // store — column families are unsupported on the HDFS provider):
    // identical oracle to q_closed_sessions, so the two APIs are
    // pinned equivalent under the hard gate.
    Q("q_stream_sessions_tws",
      (s, dir) => graft.streaming.StreamingGate.closedSessionsTwsFromFiles(s, dir),
      Some("""WITH g AS (
             |  SELECT user_id, ts, CAST(floor(value) AS BIGINT) AS dur,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  CAST(SUM(dur) AS BIGINT) AS total_duration,
             |  CAST(count(*) AS INT) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // STREAM-STREAM interval join under the hard gate: a real
    // Structured Streaming run of searchesBeforeView (both sides
    // watermarked, time-range-bounded join state) over staged
    // micro-batch slices; views = 'view' events, searches = 'click'
    // events keyed by event id. The emitted match set must equal the
    // batch interval join, which is the oracle.
    Q("q_stream_join",
      (s, dir) => graft.streaming.StreamingGate.searchJoinFromFiles(s, dir),
      Some("""SELECT v.user_id, v.ts AS view_ts,
             |  CAST(floor(v.value) AS BIGINT) AS duration,
             |  s.event_id AS search_event_id, s.ts AS search_ts
             |FROM events v JOIN events s
             |  ON v.user_id = s.user_id AND s.ts <= v.ts
             |  AND s.ts >= v.ts - INTERVAL 60 MINUTE
             |WHERE v.event_type = 'view' AND s.event_type = 'click'
             |ORDER BY v.user_id, view_ts, search_event_id""".stripMargin)),

    // STREAM-STREAM LEFT-OUTER interval join under the hard gate:
    // unmatched views emit with null search columns only when the
    // watermark closes their window (sentinel-driven) — the emitted
    // set must equal the batch LEFT JOIN, which is the oracle.
    Q("q_stream_outer_join",
      (s, dir) => graft.streaming.StreamingGate.searchJoinOuterFromFiles(s, dir),
      Some("""SELECT v.user_id, v.event_id AS view_event_id,
             |  v.ts AS view_ts, CAST(floor(v.value) AS BIGINT) AS duration,
             |  s.event_id AS search_event_id, s.ts AS search_ts
             |FROM (SELECT * FROM events WHERE event_type = 'view') v
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') s
             |  ON v.user_id = s.user_id AND s.ts <= v.ts
             |  AND s.ts >= v.ts - INTERVAL 60 MINUTE
             |ORDER BY v.user_id, view_event_id,
             |  coalesce(search_event_id, -1)""".stripMargin)),

    // STATEFUL running activeness under the hard gate: a real
    // mapGroupsWithState run (update mode) over staged micro-batch
    // slices; the final upserted row per contract must equal the batch
    // distinct-day aggregation + bucketing, which is the oracle.
    Q("q_running_activeness",
      (s, dir) => graft.streaming.StreamingGate.runningActivenessFromFiles(s, dir),
      Some("""SELECT user_id, CAST(d AS INT) AS days_active, CASE
             |  WHEN d BETWEEN 1 AND 7 THEN 'very low'
             |  WHEN d BETWEEN 8 AND 14 THEN 'low'
             |  WHEN d BETWEEN 15 AND 21 THEN 'moderate'
             |  WHEN d BETWEEN 22 AND 28 THEN 'high'
             |  WHEN d BETWEEN 29 AND 31 THEN 'very high'
             |  ELSE 'error' END AS activeness
             |FROM (SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS d
             |      FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // Left-semi join face: existence filtering without duplication —
    // the shape Catalyst also rewrites IN-subqueries and INTERSECT
    // into; at scale it ships only the join keys of the probe side.
    Q("q_semi_join",
      (s, dir) => Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // SCD Type-2 history apply: a closed legacy period (keys ≡ 0 mod
    // 5), a currently-open version for every key, and an update wave
    // (keys ≡ 0 mod 3) — the open rows must close at the update's
    // effective date, closed periods stay immutable, the newest
    // version stays open. All inputs derive from the base table so
    // both engines build identical history.
    Q("q_scd2",
      (s, dir) => {
        val cust = Tables(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val hist = cust
          .withColumn("valid_from", lit(java.sql.Date.valueOf("2024-01-01")))
          .withColumn("valid_to", lit(null).cast("date"))
          .unionByName(cust.filter(pmod(col("c_custkey"), lit(5)) === 0)
            .withColumn("c_mktsegment", lit("LEGACY"))
            .withColumn("valid_from", lit(java.sql.Date.valueOf("2023-01-01")))
            .withColumn("valid_to", lit(java.sql.Date.valueOf("2024-01-01"))))
        val upd = cust.filter(pmod(col("c_custkey"), lit(3)) === 0)
          .withColumn("c_mktsegment", lit("UPDATED"))
          .withColumn("eff", lit(java.sql.Date.valueOf("2024-06-01")))
        graft.ops.Merge.scd2Apply(hist, upd, Seq("c_custkey"), "eff")
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH hist AS (
             |  SELECT c_custkey, c_mktsegment,
             |    DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey, 'LEGACY', DATE '2023-01-01', DATE '2024-01-01'
             |  FROM customer WHERE c_custkey % 5 = 0),
             |upd AS (
             |  SELECT c_custkey, 'UPDATED' AS c_mktsegment,
             |    DATE '2024-06-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
             |  FROM customer WHERE c_custkey % 3 = 0),
             |a AS (SELECT * FROM hist UNION ALL SELECT * FROM upd)
             |SELECT c_custkey, c_mktsegment, valid_from,
             |  coalesce(valid_to, lead(valid_from)
             |    OVER (PARTITION BY c_custkey ORDER BY valid_from)) AS valid_to
             |FROM a ORDER BY c_custkey, valid_from""".stripMargin)),

    // Data-quality constraint report (the deequ-style validation a
    // load gates on): four rules — completeness, key uniqueness, a
    // numeric range and a categorical domain — measured in ONE
    // aggregation pass; the range rule genuinely fails on this data,
    // exercising the violation branch.
    Q("q_data_quality",
      (s, dir) => {
        import graft.ext.Quality
        Quality.report(Tables(s, dir, "events"), Seq(
          Quality.Rule("event_id_unique",
            Quality.uniqueness(col("event_id")), _ >= 1.0),
          Quality.Rule("event_type_known",
            Quality.inSetRatio(col("event_type"),
              Seq("click", "view", "purchase", "signup", "error")), _ >= 1.0),
          Quality.Rule("user_id_complete",
            Quality.completeness(col("user_id")), _ >= 1.0),
          Quality.Rule("value_in_0_100",
            Quality.inRangeRatio(col("value"), 0.0, 100.0), _ >= 1.0)))
          .orderBy("rule")
      },
      Some("""WITH m AS (SELECT
             |  round(CAST(count(DISTINCT event_id) AS DOUBLE) / greatest(count(*), 1), 6) AS uq,
             |  round(CAST(SUM(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6) AS ik,
             |  round(CAST(count(user_id) AS DOUBLE) / greatest(count(*), 1), 6) AS cp,
             |  round(CAST(SUM(CASE WHEN value IS NOT NULL AND value >= 0.0 AND value <= 100.0 THEN 1 ELSE 0 END) AS DOUBLE) / greatest(count(*), 1), 6) AS rng
             |  FROM events)
             |SELECT 'event_id_unique' AS rule, uq AS value, uq >= 1.0 AS passed FROM m
             |UNION ALL SELECT 'event_type_known', ik, ik >= 1.0 FROM m
             |UNION ALL SELECT 'user_id_complete', cp, cp >= 1.0 FROM m
             |UNION ALL SELECT 'value_in_0_100', rng, rng >= 1.0 FROM m
             |ORDER BY rule""".stripMargin)),

    // Batch upsert (MERGE INTO shape): updates derived from the base
    // table itself (upper-cased names for keys ≡ 0 mod 3; inserts at
    // shifted keys for keys ≡ 0 mod 7) so both engines build identical
    // input; matched rows replace, unmatched updates insert, the rest
    // persist — one shuffle on the key.
    Q("q_upsert",
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
          .select("c_custkey", "c_name", "c_mktsegment")
        val updates = cust
          .filter(pmod(col("c_custkey"), lit(3)) === 0)
          .withColumn("c_name", upper(col("c_name")))
          .unionByName(cust
            .filter(pmod(col("c_custkey"), lit(7)) === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000)
            .withColumn("c_name", upper(col("c_name"))))
        graft.ops.Merge.upsertByKey(cust, updates, Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
             |  c_mktsegment
             |FROM customer
             |UNION ALL
             |SELECT c_custkey + 1000000, upper(c_name), c_mktsegment
             |FROM customer WHERE c_custkey % 7 = 0
             |ORDER BY c_custkey""".stripMargin)),

    // Set-operator faces: INTERSECT and EXCEPT (both distinct-set
    // semantics — Spark plans them as semi/anti joins over distincts,
    // so they inherit the same scale shape as q_semi_join).
    Q("q_set_ops",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val viewers = ev.filter(col("event_type") === "view").select("user_id")
        val buyers = ev.filter(col("event_type") === "purchase").select("user_id")
        viewers.intersect(buyers).withColumn("tag", lit("both"))
          .unionByName(viewers.except(buyers).withColumn("tag", lit("view_only")))
          .orderBy("user_id", "tag")
      },
      Some("""SELECT user_id, 'both' AS tag FROM
             |  (SELECT user_id FROM events WHERE event_type = 'view'
             |   INTERSECT
             |   SELECT user_id FROM events WHERE event_type = 'purchase')
             |UNION ALL
             |SELECT user_id, 'view_only' AS tag FROM
             |  (SELECT user_id FROM events WHERE event_type = 'view'
             |   EXCEPT
             |   SELECT user_id FROM events WHERE event_type = 'purchase')
             |ORDER BY user_id, tag""".stripMargin)),

    // Collect-aggregate face: the per-key gathered list, made
    // deterministic (collect_set is orderless → sort_array) and
    // projected to a string so the cross-engine compare is exact.
    Q("q_collect_agg",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_set(col("event_type"))))
            .as("types"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
             |  count(DISTINCT event_type) AS n_types
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // WINDOWED AGG under the hard gate: a real append-mode streaming
    // run of windowedCategoryStats — windows emit only when the
    // watermark finalizes them, so the emitted set equals the batch
    // date_trunc aggregation, which is the oracle.
    Q("q_stream_window",
      (s, dir) => graft.streaming.StreamingGate.windowStatsFromFiles(s, dir),
      Some("""SELECT date_trunc('hour', ts) AS window_start, user_id, event_type,
             |  CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total_duration,
             |  count(*) AS n_events
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY window_start, user_id, event_type""".stripMargin)),

    // STREAMING EXACT DEDUP under the hard gate: every distinct
    // payload survives exactly once across micro-batch boundaries;
    // the surviving set (payload column only — the carrier row for a
    // duplicated payload is arrival-order-dependent) must equal the
    // batch DISTINCT, which is the oracle.
    Q("q_stream_dedup",
      (s, dir) => graft.streaming.StreamingGate.streamDedupFromFiles(s, dir),
      Some("SELECT DISTINCT props FROM events ORDER BY props")),

    // STREAM-STATIC ENRICH under the hard gate: every micro-batch
    // joins the broadcast category→weight dictionary (stateless —
    // dictionary misses drop, so the events corpus's 'error' category
    // must vanish) before the watermark-finalized windowed agg. The
    // weighted sums are long × long, integer-exact, so the full
    // surface hashes cross-engine.
    Q("q_stream_enrich",
      (s, dir) => graft.streaming.StreamingGate.streamEnrichFromFiles(s, dir),
      Some(s"""SELECT date_trunc('hour', ts) AS window_start, user_id, event_type,
             |  CAST(SUM(CAST(floor(value) AS BIGINT) * w) AS BIGINT) AS weighted_duration,
             |  count(*) AS n_events
             |FROM events
             |JOIN $enrichDictValuesSql
             |  AS d(event_type, w) USING (event_type)
             |GROUP BY 1, 2, 3
             |ORDER BY window_start, user_id, event_type""".stripMargin)),

    // As-of (backward) join — Spark has no native operator; the
    // union + running-last composition attaches each view's latest
    // preceding purchase value per user. Oracle = DuckDB ASOF JOIN.
    Q("q_asof_join",
      (s, dir) => {
        val e = events(s, dir)
        val views = e.filter(col("event_type") === "view")
          .select("user_id", "ts", "event_id")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("purchase_value")) // unique (key, ts) → deterministic
        AsOfJoin.asOfBackward(views, purchases,
            keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            rightCols = Seq("purchase_value"))
          .withColumn("purchase_value", round(col("purchase_value"), 6))
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id, ts, max(value) AS purchase_value
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT v.user_id, v.ts, v.event_id,
             |  round(p.purchase_value, 6) AS purchase_value
             |FROM v ASOF LEFT JOIN p
             |  ON v.user_id = p.user_id AND v.ts >= p.ts
             |ORDER BY v.user_id, v.ts, v.event_id""".stripMargin)),

    // Bucketed range join — point-in-interval as an equi-join on
    // fixed-width buckets (interval exploded to its buckets, precise
    // predicate re-checked), aggregated per band.
    Q("q_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq((0.0, 9.5, "small"), (9.5, 24.5, "mid"),
          (24.5, 50.5, "large")).toDF("lo", "hi", "band")
        RangeJoin.rangeJoin(Tables(s, dir, "lineitem"), bands,
            keyCols = Seq.empty, pointCol = "l_quantity",
            startCol = "lo", endCol = "hi", bucketWidth = 5L)
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("band")
      },
      Some(s"""SELECT band, count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem
              |JOIN (VALUES (0.0, 9.5, 'small'), (9.5, 24.5, 'mid'),
              |             (24.5, 50.5, 'large')) AS b(lo, hi, band)
              |  ON l_quantity BETWEEN lo AND hi
              |GROUP BY band ORDER BY band""".stripMargin)),

    // Hierarchical aggregates beyond the reference (extension): ROLLUP
    // over (returnflag, linestatus) with grouping_id — subtotal rows
    // carry nulls, so ordering pins NULLS FIRST on both engines.
    Q("q_rollup",
      (s, dir) => Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
              |  count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // CUBE face of the same (all 4 grouping combinations).
    // Explicit GROUPING SETS through the spark.sql TEXT surface — the
    // registry otherwise exercises only the Column API; identical SQL
    // runs on both engines (modulo grouping_id vs GROUPING alias).
    Q("q_grouping_sets",
      (s, dir) => {
        // Scoped registration: a unique view name (concurrent-safe),
        // dropped before returning — spark.sql analyzes eagerly, so the
        // returned plan no longer references the view and the session
        // catalog is left exactly as found (no `lineitem` registration
        // leaking into later queries that may run against another dir).
        val view = s"lineitem_gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        Tables(s, dir, "lineitem").createOrReplaceTempView(view)
        try
          s.sql(s"""SELECT l_returnflag, l_linestatus,
                   |  CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
                   |  count(*) AS n,
                   |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
                   |FROM $view
                   |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                   |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, gid""".stripMargin)
        finally s.catalog.dropTempView(view)
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
              |  count(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, gid""".stripMargin)),

    Q("q_cube",
      (s, dir) => Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first, col("gid").asc),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
              |  count(*) AS n, ${dsumSql("l_extendedprice")} AS sum_price
              |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, gid""".stripMargin)),

    // The TPC-H Q1-style flagship aggregation (A3 shape at bench scale).
    Q("q1_agg",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${dsumSql("l_quantity")} AS sum_qty,
              |  ${dsumSql("l_extendedprice")} AS sum_price,
              |  count(*) AS n
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
