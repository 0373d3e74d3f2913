package graft.streaming

import graft.{GraftSession, Tables}

/** Scratch wall-clock profiler for the streaming gates (dev aid).
  * `Test/runMain graft.streaming.DevGate <sfDir>` — runs the two
  * stream-stream join gates twice each and prints per-run times, so
  * staging vs query-execution cost can be split by eye against the
  * Spark UI / log timestamps.
  */
object DevGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, "graft-dev-gate")
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "events").count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    (1 to 2).foreach { i =>
      time(s"outer run$i") {
        StreamingGate.searchJoinOuterFromFiles(spark, sfDir).count()
      }
      time(s"inner run$i") {
        StreamingGate.searchJoinFromFiles(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
