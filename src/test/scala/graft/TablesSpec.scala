package graft

import org.apache.spark.sql.types.TimestampType

/** Pin [[Tables]]' type-adaptive events loading: the driver has
  * regenerated events.parquet with different `ts` physical types
  * across rounds (TIMESTAMP(NANOS), then TIMESTAMP(MICROS, ntz) —
  * the round-8 switch broke every events query), so the loader must
  * yield the SAME session-TZ TimestampType values regardless of which
  * generation it reads. Fixtures under src/test/resources hold one
  * identical 12-row table per physical type.
  */
class TablesSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/$name/events.parquet") match {
      case null => fail(s"missing test fixture $name")
      case url  => new java.io.File(url.toURI).getParent
    }

  private def load(name: String) =
    Tables(spark, fixture(name), "events")

  test("all ts physical-type generations load as TimestampType") {
    for (f <- Seq("events_ts_nanos", "events_ts_micros_ntz", "events_ts_tz")) {
      val df = load(f)
      df.schema("ts").dataType shouldBe TimestampType
      df.count() shouldBe 12L
    }
  }

  test("micros-ntz and tz generations yield identical ts values") {
    val ntz = load("events_ts_micros_ntz")
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val tz = load("events_ts_tz")
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    ntz.sortBy(_._1) shouldBe tz.sortBy(_._1)
  }

  test("nanos generation matches micros values after truncation") {
    // the fixtures' micro components are exact in both files, so
    // nanos-read-as-long div 1000 must land on the same micros
    val nanos = load("events_ts_nanos")
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val micros = load("events_ts_micros_ntz")
      .select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    nanos.sortBy(_._1) shouldBe micros.sortBy(_._1)
  }
}
