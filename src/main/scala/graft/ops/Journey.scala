package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an event log: ordered funnels and
  * cohort retention — the two workhorse behavioral queries a Customer
  * 360 store gets asked next, after the per-user profile
  * (SURVEY.md §3.1's interaction branch is the per-user face; these
  * are the across-users faces).
  */
object Journey {

  /** Strictly-ordered funnel: a user completes step k at the EARLIEST
    * event of `steps(k)` that is strictly later than their step-k-1
    * completion (greedy earliest chain — identical to the classic
    * sequential-min-CTE definition, since each minimum is taken over
    * events after the previous minimum).
    *
    * Shape at scale: filter to funnel event types (pushed to the
    * scan), ONE shuffle on the user key, then a per-user sorted fold
    * (`aggregate` over the collected step events — state is one
    * timestamp per step, O(steps)); the final per-step rollup is a
    * `steps.size`-row aggregate. No self-joins, no per-step passes
    * over the log. Per-user collected state is only that user's
    * funnel-step events; a pathological hot user is bounded by their
    * own event count (salt the user key upstream if one user exceeds
    * a partition).
    *
    * Output: one row per step — `step_idx`, `step`, `n_users` (users
    * completing the step), `total_delay_us` (sum over completing
    * users of microseconds since their previous step; 0 for step 0) —
    * exact integers, so the oracle compare is drift-free.
    */
  /** `maxStepGapSec`: when set, a step only counts within that many
    * seconds of the previous step's completion — the "convert within
    * T" product-analytics semantic. The greedy chain stays correct:
    * the earliest in-window candidate is still taken, and a candidate
    * beyond the window never closes the step (it can't "use up" the
    * slot — a later event re-tests against the SAME previous-step
    * time).
    */
  def funnel(df: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, steps: Seq[String],
      maxStepGapSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.size
    val stepIdx = steps.tail.zipWithIndex.foldLeft(
      when(typeCol === steps.head, 0)) { case (w, (s, i)) => w.when(typeCol === s, i + 1) }

    val perUser = df
      .filter(typeCol.isin(steps: _*))
      .select(userCol.as("__u"), tsCol.as("__ts"), stepIdx.as("__k"))
      .groupBy("__u")
      .agg(array_sort(collect_list(struct(col("__ts").as("ts"), col("__k").as("k"))))
        .as("evs"))
      // Greedy chain fold: acc(k) = completion time of step k (1-based
      // element_at; pos k-1). An event advances step e.k iff that step
      // is still open and the previous step closed strictly earlier.
      // CaseWhen branches evaluate lazily, so element_at(acc, 0) is
      // never touched for step-0 events (ANSI-safe).
      .withColumn("reach", aggregate(
        col("evs"),
        array_repeat(lit(null).cast("timestamp"), k),
        (acc, e) => {
          val ki = e.getField("k")
          val ts = e.getField("ts")
          val inWindow = maxStepGapSec match {
            case Some(g) => unix_micros(ts) -
              unix_micros(element_at(acc, ki)) <= lit(g * 1000000L)
            case None => lit(true)
          }
          val prevClosed = when(ki === 0, lit(true))
            .otherwise(element_at(acc, ki).isNotNull &&
              ts > element_at(acc, ki) && inWindow)
          transform(acc, (t, i) =>
            when(i === ki && t.isNull && prevClosed, ts).otherwise(t))
        }))

    perUser
      .select(col("reach"), posexplode(col("reach")).as(Seq("si", "rt")))
      .withColumn("delay_us",
        when(col("rt").isNull, lit(null).cast("long"))
          .when(col("si") === 0, lit(0L))
          .otherwise(unix_micros(col("rt")) -
            unix_micros(element_at(col("reach"), col("si")))))
      .groupBy("si")
      .agg(count(col("rt")).as("n_users"), sum(col("delay_us")).as("total_delay_us"))
      .select(
        col("si").cast("int").as("step_idx"),
        element_at(array(steps.map(lit): _*), col("si") + 1).as("step"),
        col("n_users"), col("total_delay_us"))
      .orderBy("step_idx")
  }

  /** Event transition matrix (first-order user-flow): for each
    * consecutive event pair within a user's (ts, tie) order, count
    * (from → to) transitions and each destination's share of its
    * source row — the Markov/Sankey view of the event log. One
    * key shuffle for the lead window; the count rollup and the
    * |types|² share window ride on tiny data. `share` is a single
    * int/int division, engine-stable.
    */
  def transitionMatrix(df: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    df.select(typeCol.as("from_type"),
        lead(typeCol, 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") /
        sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-aligned
    * `date_trunc`) of a user's first event; a cohort member is
    * "active at offset w" if they have any event in cohort-week + w.
    *
    * Shape at scale: ONE shuffle on the user key collapses the log to
    * (user, first-week, distinct-active-weeks) — per-user state is
    * bounded by calendar weeks of history, not events — then the
    * explode + (cohort, offset) rollup runs on |users| × weeks rows,
    * orders of magnitude smaller than the log. `retention` is a
    * single int/int division (correctly rounded on any engine), not a
    * float sum.
    */
  def cohortRetention(df: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val act = df
      .select(userCol.as("__u"), to_date(date_trunc("week", tsCol)).as("__wk"))
      .groupBy("__u")
      .agg(min(col("__wk")).as("cohort"), collect_set(col("__wk")).as("wks"))
      .select(col("__u"), col("cohort"), explode(col("wks")).as("wk"))
      .withColumn("week_offset", floor(datediff(col("wk"), col("cohort")) / 7).cast("int"))
    act
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_active")) // (user, week) rows are distinct by construction
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .withColumn("retention", round(col("n_active") / col("cohort_size"), 6))
      .orderBy("cohort", "week_offset")
  }

  /** Top-k session paths: sessionize by inactivity gap (lag-based,
    * the same `>= gap` break rule as the session-window queries),
    * join each session's first `maxLen` event types into a `>`-path,
    * and count sessions per path — the "what do users actually do"
    * flow-mining query behind Sankey/path-explorer UIs.
    *
    * Shape at scale: ONE shuffle on the user key (the session window
    * + the per-session collect ride the same partitioning), then a
    * map-side-combinable path count and a distributed TakeOrdered for
    * the top k. Per-session state is capped: `collect_list` gathers
    * only that session's events and the path truncates to `maxLen`
    * types, so a bot session of a million events costs its collect
    * but never a megabyte-wide string or a hot aggregation key — and
    * hot PATHS ("view" alone) collapse map-side before they travel.
    */
  def topPaths(df: DataFrame, userCol: Column, tsCol: Column,
      typeCol: Column, tieCol: Column, gapMin: Int = 30,
      maxLen: Int = 8, topK: Int = 20): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val brk = when(unix_micros(tsCol) - unix_micros(lag(tsCol, 1).over(w))
      >= gapMin * 60L * 1000000L, 1).otherwise(0)
    df.withColumn("__sid",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(userCol.as("__u"), col("__sid"))
      .agg(array_join(slice(transform(
          array_sort(collect_list(struct(tsCol.as("t"), tieCol.as("i"),
            typeCol.as("y")))),
          x => x("y")), 1, maxLen), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }
}
