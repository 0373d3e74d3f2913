package graft

/** Scratch: streaming-admission gate ladder — times
  * q_stream_admit end-to-end (staging + 3 micro-batches + bloom +
  * stream-static anti join) on the generated planted-profile corpora.
  */
object DevAdmitScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-dev-admit-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_f3", "/tmp/scale_f10", "/tmp/scale_f30")
    // warm
    graft.streaming.StreamingGate.streamAdmitFromFiles(spark, "/root/testdata/sf0.001").count()
    val gates = Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      "stream_admit" -> graft.streaming.StreamingGate.streamAdmitFromFiles,
      "stream_admit_substring" ->
        graft.streaming.StreamingGate.streamAdmitSubstringFromFiles,
      "stream_admit_fuzzy" ->
        graft.streaming.StreamingGate.streamAdmitFuzzyFromFiles)
    dirs.foreach { dir =>
      gates.foreach { case (name, fn) =>
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          println(f"[scale] $dir $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
