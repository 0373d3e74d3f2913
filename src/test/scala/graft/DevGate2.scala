package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Finer-grained gate cost split (dev aid): staging write, stream
  * start-to-first-batch, total query wall, and teardown for a minimal
  * copy of the outer-join gate.
  */
object DevGate2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, "graft-dev-gate2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Tables(spark, sfDir, "events").count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { i =>
      spark.conf.set("spark.sql.shuffle.partitions", 4)
      val stage = Files.createTempDirectory("devgate2_")
      val events = Tables(spark, sfDir, "events")
      val tagged = t(s"tag+plan    run$i") {
        events.filter(col("event_type") === "view").select(
            col("user_id").cast("string").as("contract"),
            col("event_type").as("category"),
            floor(col("value")).cast("long").as("duration"),
            col("event_id").cast("string").as("keyword"),
            col("ts"), lit("v").as("side"))
          .unionByName(events.filter(col("event_type") === "click").select(
            col("user_id").cast("string").as("contract"),
            lit(null).cast("string").as("category"),
            lit(null).cast("long").as("duration"),
            col("event_id").cast("string").as("keyword"),
            col("ts"), lit("s").as("side")))
      }
      val maxTs = t(s"bounds agg  run$i") {
        tagged.agg(max(col("ts"))).head().getTimestamp(0)
      }
      t(s"stage write run$i") {
        tagged.orderBy("ts").coalesce(1).write.mode("overwrite")
          .parquet(stage.resolve("data").toString)
      }
      val farFuture = new Timestamp(maxTs.getTime + 365L * 24 * 3600 * 1000)
      t(s"sentinels   run$i") {
        Seq(("__sentinel__", "view", 0L, "0", farFuture, "v"),
            ("__sentinel__", "view", 0L, "0",
              new Timestamp(farFuture.getTime + 3600000L), "v"))
          .toDF("contract", "category", "duration", "keyword", "ts", "side")
          .coalesce(1).write.mode("append")
          .parquet(stage.resolve("data").toString)
      }
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "contract string, category string, duration long, keyword string, ts timestamp, side string"))
        .parquet(stage.resolve("data").toString)
      val views = stream.filter(col("side") === "v")
        .select(col("contract"), col("keyword").as("view_id"),
          col("duration"), col("ts"))
      val searches = stream.filter(col("side") === "s")
        .select("contract", "keyword", "ts")
      var n = 0L
      val query = t(s"qry start   run$i") {
        Streaming.searchesBeforeViewOuter(views, searches,
            interval = "60 minutes", watermark = "1 hour")
          .writeStream
          .option("checkpointLocation", stage.resolve("ckpt").toString)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            n += b.count(); ()
          }
          .start()
      }
      t(s"qry drain   run$i") { query.processAllAvailable() }
      t(s"qry stop    run$i") { query.stop() }
      println(s"[prof] rows=$n")
      org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
    }
    spark.stop()
  }
}
