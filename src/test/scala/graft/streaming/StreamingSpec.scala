package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.streaming.Streaming.{ActivenessUpdate, ViewEvent}

/** Structured Streaming operators driven through MemoryStream
  * micro-batches: tumbling-window category stats, session windows,
  * stateful running activeness.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("windowedCategoryStats: tumbling event-time windows sum per category") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.windowedCategoryStats(in.toDF(), "1 hour", "1 day")
      .writeStream.format("memory").queryName("wcs").outputMode("complete").start()
    withQuery(q) {
      in.addData(
        ViewEvent("c1", "content", 10L, ts("2022-04-01 10:05:00")),
        ViewEvent("c1", "content", 5L, ts("2022-04-01 10:55:00")),
        ViewEvent("c1", "content", 7L, ts("2022-04-01 11:05:00")), // next window
        ViewEvent("c2", "commerce", 3L, ts("2022-04-01 10:10:00")))
      q.processAllAvailable()
      val out = spark.table("wcs")
        .selectExpr("window.start", "contract", "category", "TotalDuration", "n_events")
      rowSet(out) shouldBe Set(
        Seq(ts("2022-04-01 10:00:00"), "c1", "content", 15L, 2L),
        Seq(ts("2022-04-01 11:00:00"), "c1", "content", 7L, 1L),
        Seq(ts("2022-04-01 10:00:00"), "c2", "commerce", 3L, 1L))
    }
  }

  test("sessionWatch: events within the gap merge, beyond it split") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.sessionWatch(in.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sw").outputMode("complete").start()
    withQuery(q) {
      in.addData(
        ViewEvent("c1", "content", 10L, ts("2022-04-01 10:00:00")),
        ViewEvent("c1", "content", 5L, ts("2022-04-01 10:20:00")),  // same session
        ViewEvent("c1", "content", 7L, ts("2022-04-01 12:00:00")))  // new session
      q.processAllAvailable()
      val out = spark.table("sw")
        .selectExpr("contract", "session_start", "TotalDuration", "n_events")
      rowSet(out) shouldBe Set(
        Seq("c1", ts("2022-04-01 10:00:00"), 15L, 2L),
        Seq("c1", ts("2022-04-01 12:00:00"), 7L, 1L))
    }
  }

  test("closedSessions: each session emitted exactly once — gap close and timeout close") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.closedSessions(in.toDS(), gapMs = 30L * 60 * 1000,
      watermark = "1 hour")
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    withQuery(q) {
      // batch 1: c1 opens a 2-event session; c2 opens a 1-event session
      in.addData(
        ViewEvent("c1", "content", 10L, ts("2022-04-01 10:00:00")),
        ViewEvent("c1", "content", 5L, ts("2022-04-01 10:20:00")),
        ViewEvent("c2", "commerce", 3L, ts("2022-04-01 10:00:00")))
      q.processAllAvailable()
      spark.table("cs").count() shouldBe 0L // nothing closed yet

      // batch 2: a much later c1 event closes c1's first session in-batch
      // and advances the watermark to 12:00 — past c2's 10:30 timeout
      in.addData(ViewEvent("c1", "content", 7L, ts("2022-04-01 13:00:00")))
      q.processAllAvailable()
      // batch 3: another c1 event fires c2's event-time timeout and
      // closes c1's 13:00 session in-batch; c1's 16:00 session stays open
      in.addData(ViewEvent("c1", "content", 1L, ts("2022-04-01 16:00:00")))
      q.processAllAvailable()

      val out = spark.table("cs").selectExpr("contract", "session_start",
        "session_end", "totalDuration", "n_events")
      rowSet(out) shouldBe Set(
        Seq("c1", ts("2022-04-01 10:00:00"), ts("2022-04-01 10:50:00"), 15L, 2),
        Seq("c2", ts("2022-04-01 10:00:00"), ts("2022-04-01 10:30:00"), 3L, 1),
        Seq("c1", ts("2022-04-01 13:00:00"), ts("2022-04-01 13:30:00"), 7L, 1))
    }
  }

  test("closedSessionsTws: transformWithState twin matches the fMGWS session machine") {
    implicit val ctx = spark.sqlContext
    // transformWithState needs column families → RocksDB provider (the
    // production profile; HDFS-backed stores reject it outright)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.GraftSession.rocksDbStateStore(key))
    try {
    val in = MemoryStream[ViewEvent]
    val q = Streaming.closedSessionsTws(in.toDS(), gapMs = 30L * 60 * 1000,
      watermark = "1 hour")
      .writeStream.format("memory").queryName("cstws").outputMode("append").start()
    withQuery(q) {
      // same scenario as the closedSessions spec: c1 opens a 2-event
      // session, c2 opens a 1-event session
      in.addData(
        ViewEvent("c1", "content", 10L, ts("2022-04-01 10:00:00")),
        ViewEvent("c1", "content", 5L, ts("2022-04-01 10:20:00")),
        ViewEvent("c2", "commerce", 3L, ts("2022-04-01 10:00:00")))
      q.processAllAvailable()
      spark.table("cstws").count() shouldBe 0L // nothing closed yet

      // a much later c1 event closes c1's session in-batch and moves
      // the watermark past c2's 10:30 timer
      in.addData(ViewEvent("c1", "content", 7L, ts("2022-04-01 13:00:00")))
      q.processAllAvailable()
      // next batch: c2's expired TIMER fires and closes its session;
      // c1's 13:00 session closes in-batch; 16:00 stays open
      in.addData(ViewEvent("c1", "content", 1L, ts("2022-04-01 16:00:00")))
      q.processAllAvailable()

      val out = spark.table("cstws").selectExpr("contract", "session_start",
        "session_end", "totalDuration", "n_events")
      rowSet(out) shouldBe Set(
        Seq("c1", ts("2022-04-01 10:00:00"), ts("2022-04-01 10:50:00"), 15L, 2),
        Seq("c2", ts("2022-04-01 10:00:00"), ts("2022-04-01 10:30:00"), 3L, 1),
        Seq("c1", ts("2022-04-01 13:00:00"), ts("2022-04-01 13:30:00"), 7L, 1))
    }
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("searchesBeforeView: stream-stream interval join bounds matches to the window") {
    implicit val ctx = spark.sqlContext
    import Streaming.SearchEvent
    val views = MemoryStream[ViewEvent]
    val searches = MemoryStream[SearchEvent]
    val q = Streaming.searchesBeforeView(views.toDF(), searches.toDF(),
      interval = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("sbv").outputMode("append").start()
    withQuery(q) {
      searches.addData(
        SearchEvent("c1", "thriller", ts("2022-04-01 09:30:00")), // in window
        SearchEvent("c1", "old news", ts("2022-04-01 08:00:00")), // too early
        SearchEvent("c2", "other",    ts("2022-04-01 09:45:00"))) // other key
      views.addData(ViewEvent("c1", "content", 10L, ts("2022-04-01 10:00:00")))
      q.processAllAvailable()
      val out = spark.table("sbv").selectExpr("contract", "keyword", "view_ts")
      rowSet(out) shouldBe Set(
        Seq("c1", "thriller", ts("2022-04-01 10:00:00")))
    }
  }

  test("searchesBeforeViewOuter: matches emit eagerly, unmatched views null-pad on watermark") {
    implicit val ctx = spark.sqlContext
    import Streaming.SearchEvent
    val views = MemoryStream[OuterViewEvent]
    val searches = MemoryStream[SearchEvent]
    val q = Streaming.searchesBeforeViewOuter(views.toDF(), searches.toDF(),
      interval = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("sbvo").outputMode("append").start()
    withQuery(q) {
      searches.addData(SearchEvent("c1", "thriller", ts("2022-04-01 09:30:00")))
      views.addData(
        OuterViewEvent("c1", "v1", 10L, ts("2022-04-01 10:00:00")), // matched
        OuterViewEvent("c2", "v2", 20L, ts("2022-04-01 10:00:00"))) // no search
      q.processAllAvailable()
      def rows = rowSet(spark.table("sbvo")
        .selectExpr("contract", "view_id", "keyword"))
      // matched row emits eagerly; the unmatched view waits in state
      rows shouldBe Set(Seq("c1", "v1", "thriller"))
      // advance BOTH branch watermarks far past v2's join window (the
      // advancing pair matches itself — equal ts is within the window)
      views.addData(OuterViewEvent("cx", "vx", 0L, ts("2022-04-02 00:00:00")))
      searches.addData(SearchEvent("cx", "kx", ts("2022-04-02 00:00:00")))
      q.processAllAvailable()
      rows shouldBe Set(Seq("c1", "v1", "thriller"), Seq("c2", "v2", null),
        Seq("cx", "vx", "kx"))
    }
  }

  test("closedSessions: late event beyond the gap closes alone, not merged across silence") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.closedSessions(in.toDS(), gapMs = 30L * 60 * 1000,
      watermark = "6 hours") // wide watermark: the late event is NOT dropped
      .writeStream.format("memory").queryName("cs2").outputMode("append").start()
    withQuery(q) {
      in.addData(ViewEvent("c1", "content", 10L, ts("2022-04-01 12:00:00")))
      q.processAllAvailable()
      // 55 minutes BEFORE the open session — more than the gap away
      in.addData(ViewEvent("c1", "content", 5L, ts("2022-04-01 11:05:00")))
      q.processAllAvailable()
      val out = spark.table("cs2").selectExpr("contract", "session_start",
        "session_end", "totalDuration", "n_events")
      // the late event finalized alone; the 12:00 session is still open
      rowSet(out) shouldBe Set(
        Seq("c1", ts("2022-04-01 11:05:00"), ts("2022-04-01 11:35:00"), 5L, 1))
    }
  }

  test("runningActiveness: distinct-day state accumulates across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.runningActiveness(in.toDS())
      .writeStream.format("memory").queryName("ra").outputMode("update").start()
    withQuery(q) {
      // batch 1: 2 distinct days (one duplicated)
      in.addData(
        ViewEvent("c1", "content", 1L, ts("2022-04-01 10:00:00")),
        ViewEvent("c1", "content", 1L, ts("2022-04-01 23:00:00")),
        ViewEvent("c1", "content", 1L, ts("2022-04-02 10:00:00")))
      q.processAllAvailable()
      // batch 2: 6 more distinct days → 8 total → "low"
      in.addData((3 to 8).map(d =>
        ViewEvent("c1", "content", 1L, ts(f"2022-04-$d%02d 09:00:00"))): _*)
      q.processAllAvailable()
      val updates = spark.table("ra").as[ActivenessUpdate].collect()
      val byBatch = updates.sortBy(_.daysActive)
      byBatch.map(u => (u.daysActive, u.activeness)).toSeq shouldBe
        Seq((2, "very low"), (8, "low"))
    }
  }

  test("sinkEachBatch: micro-batches route through a batch Sink") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-fb").toFile
    dir.deleteOnExit()
    val in = MemoryStream[ViewEvent]
    val q = Streaming.sinkEachBatch(
      in.toDF().groupBy("contract").count(),
      graft.io.ParquetSink(s"$dir/out.parquet"),
      s"$dir/ckpt")
    withQuery(q) {
      in.addData(
        ViewEvent("c1", "content", 1L, ts("2022-04-01 10:00:00")),
        ViewEvent("c1", "content", 1L, ts("2022-04-01 11:00:00")),
        ViewEvent("c2", "content", 1L, ts("2022-04-01 10:30:00")))
      q.processAllAvailable()
      rowSet(spark.read.parquet(s"$dir/out.parquet")) shouldBe
        Set(Seq("c1", 2L), Seq("c2", 1L))
    }
  }

  test("streamingExactDedup: duplicate payloads within the watermark are dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.streamingExactDedup(in.toDF(), textCol = "category")
      .writeStream.format("memory").queryName("sed").outputMode("append").start()
    withQuery(q) {
      in.addData(
        ViewEvent("c1", "payload-A", 1L, ts("2022-04-01 10:00:00")),
        ViewEvent("c2", "payload-A", 2L, ts("2022-04-01 10:01:00")), // dup content
        ViewEvent("c3", "payload-B", 3L, ts("2022-04-01 10:02:00")))
      q.processAllAvailable()
      // dup arriving in a later micro-batch is still caught by state
      in.addData(ViewEvent("c4", "payload-B", 4L, ts("2022-04-01 10:03:00")))
      q.processAllAvailable()
      spark.table("sed").select("category").collect()
        .map(_.getString(0)).sorted.toSeq shouldBe Seq("payload-A", "payload-B")
    }
  }

  test("readStreamJson: file-source stream picks up day files with pinned schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    java.nio.file.Files.writeString(
      new java.io.File(dir, "20220401.json").toPath,
      """{"_source": {"Contract": "c1", "Mac": "m1", "AppName": "VOD", "TotalDuration": 5}}""")
    val q = Streaming.readStreamJson(spark, graft.schema.Schemas.logContent,
        dir.getAbsolutePath)
      .selectExpr("_source.Contract AS contract", "_source.TotalDuration AS dur")
      .writeStream.format("memory").queryName("rsj").outputMode("append").start()
    withQuery(q) {
      q.processAllAvailable()
      rowSet(spark.table("rsj")) shouldBe Set(Seq("c1", 5L))
      // a new day lands → next micro-batch appends it
      java.nio.file.Files.writeString(
        new java.io.File(dir, "20220402.json").toPath,
        """{"_source": {"Contract": "c2", "Mac": "m2", "AppName": "VOD", "TotalDuration": 7}}""")
      q.processAllAvailable()
      rowSet(spark.table("rsj")) shouldBe Set(Seq("c1", 5L), Seq("c2", 7L))
    }
  }

  test("runningActiveness: state is per-contract") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ViewEvent]
    val q = Streaming.runningActiveness(in.toDS())
      .writeStream.format("memory").queryName("ra2").outputMode("update").start()
    withQuery(q) {
      in.addData(
        ViewEvent("c1", "content", 1L, ts("2022-04-01 10:00:00")),
        ViewEvent("c2", "content", 1L, ts("2022-04-01 10:00:00")),
        ViewEvent("c2", "content", 1L, ts("2022-04-02 10:00:00")))
      q.processAllAvailable()
      val updates = spark.table("ra2").as[ActivenessUpdate].collect()
        .map(u => u.contract -> u.daysActive).toMap
      updates shouldBe Map("c1" -> 1, "c2" -> 2)
    }
  }
}

/** View event carrying its own id — input shape of
  * [[Streaming.searchesBeforeViewOuter]] (top-level for the encoder).
  */
final case class OuterViewEvent(contract: String, view_id: String,
    duration: Long, ts: java.sql.Timestamp)
