package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking (the deequ/GE-style validation
  * stage every production load runs before publishing): completeness,
  * uniqueness, range and set-membership checks computed in ONE
  * map-side-combinable aggregation over the table — at 100 TB the
  * difference between "validation is one extra scan" and "validation
  * is a scan per rule".
  *
  * Each rule reduces to an aggregate expression; the report is one
  * row per rule with the measured value and the pass verdict, so a
  * load job can `.filter(!passed).isEmpty`-gate publication.
  */
object Quality {

  /** One constraint: a name, an aggregate measure (over the whole
    * frame), and the predicate the measure must satisfy.
    */
  final case class Rule(name: String, measure: Column, passed: Column => Column)

  /** Completeness: fraction of non-null values in `c` (1.0 = complete). */
  def completeness(c: Column): Column =
    count(c).cast("double") / greatest(count(lit(1)), lit(1L)).cast("double")

  /** Uniqueness: distinct values / rows (1.0 = a key). */
  def uniqueness(c: Column): Column =
    countDistinct(c).cast("double") / greatest(count(lit(1)), lit(1L)).cast("double")

  /** Fraction of values inside [lo, hi] (nulls count as violations). */
  def inRangeRatio(c: Column, lo: Double, hi: Double): Column =
    sum(when(c.isNotNull && c >= lo && c <= hi, 1L).otherwise(0L)).cast("double") /
      greatest(count(lit(1)), lit(1L)).cast("double")

  /** Fraction of values in the allowed set (nulls violate). */
  def inSetRatio(c: Column, allowed: Seq[String]): Column =
    sum(when(c.isInCollection(allowed), 1L).otherwise(0L)).cast("double") /
      greatest(count(lit(1)), lit(1L)).cast("double")

  /** Evaluate all rules in one aggregation pass: returns
    * (rule, value, passed), one row per rule, in rule order.
    * Measures are rounded to 6 decimals BEFORE the verdict so the
    * boolean cannot flip on a ulp between engines.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val measured = df.agg(
      round(rules.head.measure, 6).as(rules.head.name),
      rules.tail.map(r => round(r.measure, 6).as(r.name)): _*)
    val rows = rules.map { r =>
      struct(lit(r.name).as("rule"), col(r.name).as("value"),
        r.passed(col(r.name)).as("passed"))
    }
    measured
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.value"), col("r.passed"))
  }
}
