package graft

/** Scratch: reproduce/inspect bpeTrain behavior on the sf tables. */
object DevBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "dev-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    try {
      val out = graft.ext.TextAnalysis.bpeTrain(
        Tables(spark, dir, "documents"), "text", merges = 20)
      out.show(30, false)
    } catch {
      case e: Throwable =>
        println(s"[bpe] FAILED: $e")
        e.printStackTrace()
    }
    println(f"[bpe] wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
