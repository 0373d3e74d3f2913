package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One shared local session for the whole suite — session startup is
  * ~5s, so per-suite sessions would dominate test wall-clock.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // part of the GraftSession profile (coLocatedJoin's zero-Sort
      // plan reads it at PLAN time; the join builder no longer mutates
      // the caller's conf, so the test session pins it like a
      // deployment would)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = TestSpark.spark

  /** Rows as a set of Seq[Any] — order-free comparison. */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rowList(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def singleValue(df: DataFrame): Any = {
    val rows = df.collect()
    rows.length shouldBe 1
    rows.head.toSeq.length shouldBe 1
    rows.head.get(0)
  }
}
