package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins (SURVEY.md §4 "skew").
  *
  * AQE's skew-join split handles most cases at runtime; salting is for
  * the pathological key (one user/contract owning a double-digit share
  * of rows) where even split shuffle blocks overflow a task. The
  * skewed side gets a uniform salt in [0, salts); the other side is
  * replicated `salts`× so every (key, salt) pair still meets. Join
  * output is identical to the unsalted join for any salt assignment;
  * only the shuffle layout changes — the hot key now spreads over
  * `salts` tasks at the cost of replicating the build side.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = skewed.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Frequency-based skew report: the top-n heaviest keys and their
    * share — the sizing input for `salts` (a key carrying p of all
    * rows wants roughly p × shuffle-partitions salts).
    */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share", col("n_rows") / lit(total.toDouble))
      .orderBy(col("n_rows").desc)
      .limit(topN)
  }
}
