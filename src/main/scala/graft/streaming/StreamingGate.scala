package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Drives the STATEFUL streaming path under the same hard oracle gate
  * as the batch registry: a REAL Structured Streaming execution
  * (file source → micro-batches → `flatMapGroupsWithState` →
  * `foreachBatch`), not a batch face of it — the
  * [[Streaming.closedSessions]] state machine, watermark advancement,
  * and event-time timeouts all actually run.
  *
  * Determinism story (what makes a streaming run oracle-checkable):
  * - the events table is staged into files partitioned by TIME RANGE
  *   with strictly increasing modification times, so the file source
  *   (`maxFilesPerTrigger = 1`) replays them as micro-batches in event-
  *   time order — the watermark only ever moves forward past data that
  *   has already arrived, so no event is ever late and the
  *   late-data tradeoffs documented on [[Streaming.closedSessions]]
  *   never trigger;
  * - two sentinel files follow the real slices: the first advances max
  *   event time far past every real session, the second triggers the
  *   micro-batch whose watermark (= sentinel1 − delay) fires the
  *   event-time timeout that closes every still-open real session.
  *   Sentinel rows are filtered from the output (their own sessions
  *   are never emitted, or closed and then filtered);
  * - therefore: emitted sessions = EXACTLY the batch gaps-and-islands
  *   sessionization of the same events, which is the DuckDB oracle.
  *
  * At 100 TB/day the same topology runs unbounded: the staging step is
  * replaced by the real landing directory, the sentinels by the
  * continuous arrival of newer days, and foreachBatch by a parquet/
  * JDBC sink — state per key stays one fixed-size SessionState either
  * way.
  */
object StreamingGate {

  private val stageSchema = StructType(Seq(
    StructField("contract", StringType),
    StructField("category", StringType),
    StructField("duration", LongType),
    StructField("ts", TimestampType)))

  private val Sentinel = "__sentinel__"

  /** Move the single part file under `srcDir` to `data/f<i>.parquet`
    * with a deterministic, strictly increasing modification time — the
    * file source orders batches by modTime, so this pins replay order.
    */
  private def promoteSlice(srcDir: java.io.File, stage: Path, i: Int,
      baseMs: Long): Unit = {
    val part = srcDir.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $srcDir"))
    val dest = stage.resolve("data").resolve(f"f$i%02d.parquet")
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    dest.toFile.setLastModified(baseMs + i * 60000L)
  }

  /** Write `df` as a single parquet file slice (tiny frames only). */
  private def writeSlice(df: DataFrame, stage: Path, i: Int, baseMs: Long): Unit = {
    val tmp = stage.resolve(s"tmp$i")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    promoteSlice(tmp.toFile, stage, i, baseMs)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  /** Sessionize the events table through the real streaming stack and
    * return the closed sessions as a batch DataFrame: (user_id,
    * session_start, session_end, total_duration, n_events), ordered.
    * duration = floor(value) so the sum is exact integer arithmetic on
    * both engines.
    */
  def closedSessionsFromFiles(s: SparkSession, dir: String,
      gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame = {
    import s.implicits._
    val stage = Files.createTempDirectory(
      Files.createDirectories(Paths.get("target", "streamtmp").toAbsolutePath),
      "gate_")
    try {
      val ev = Tables(s, dir, "events").select(
        col("user_id").cast("string").as("contract"),
        col("event_type").as("category"),
        floor(col("value")).cast("long").as("duration"),
        col("ts"))
      val baseMs = System.currentTimeMillis() - 3600000L
      // day-of-month slices: each file strictly after the previous one
      // in event time (events span one month; UTC session timezone).
      // ONE scan + one hash shuffle on the slice id writes all slices
      // (each slice's rows land in exactly one task → one part file per
      // slice dir), replacing a filtered re-scan per slice.
      val nSlices = 2
      val tmp = stage.resolve("sliced")
      ev.withColumn("slice",
          when(dayofmonth(col("ts")) <= 15, 0).otherwise(1))
        .repartition(nSlices, col("slice"))
        .write.partitionBy("slice").parquet(tmp.toString)
      (0 until nSlices).foreach { i =>
        promoteSlice(tmp.resolve(s"slice=$i").toFile, stage, i, baseMs)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      val farFuture = Timestamp.valueOf("2024-06-01 00:00:00")
      val later = new Timestamp(farFuture.getTime + 3600000L)
      Seq(farFuture, later).zipWithIndex.foreach { case (t, i) =>
        writeSlice(Seq((Sentinel, "view", 0L, t))
          .toDF("contract", "category", "duration", "ts"),
          stage, nSlices + i, baseMs)
      }

      val stream = s.readStream
        .schema(stageSchema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage.resolve("data").toString)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Streaming.SessionSummary]
      val query = Streaming.closedSessions(stream.as[Streaming.ViewEvent],
          gapMs = gapMinutes * 60000L, watermark = watermark)
        .writeStream
        .option("checkpointLocation", stage.resolve("ckpt").toString)
        .outputMode("append")
        .foreachBatch { (batch: Dataset[Streaming.SessionSummary], _: Long) =>
          val rows = batch.collect()
          buf.synchronized { buf ++= rows }
          () // the lambda must be (Dataset, Long) => Unit
        }
        .start()
      query.processAllAvailable()
      query.stop()

      buf.synchronized { buf.filter(_.contract != Sentinel).toSeq }.toDS().toDF()
        .select(col("contract").cast("long").as("user_id"),
          col("session_start"), col("session_end"),
          col("totalDuration").as("total_duration"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
    }
  }
}
