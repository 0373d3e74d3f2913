package graft

/** Scratch: stride-1 vs winnowed substring family A/B at a given sf —
  * index volumes and end-to-end walls. Feeds SCALE.md §winnow.
  */
object DevWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, "dev-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[win] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables(spark, sfDir, "documents")
    d.count() // warm
    val n1 = time("stride-1 index build+count") {
      graft.ext.Dedup.spanHashIndex(d, "doc_id", "text", 8).count()
    }
    val n4 = time("winnowed index build+count (w=4)") {
      graft.ext.Dedup.winnowedSpanHashIndex(d, "doc_id", "text", 8, 4).count()
    }
    println(f"[win] index rows: stride-1 $n1%d vs winnowed $n4%d (${n1.toDouble / n4}%.2fx cut)")
    (1 to 2).foreach { k =>
      time(s"pairs stride-1 #$k") {
        graft.ext.Dedup.crossDocSpanPairs(d, "doc_id", "text",
          spanWords = 8, minShared = 2L).count()
      }
      time(s"pairs winnowed #$k") {
        graft.ext.Dedup.crossDocSpanPairs(d, "doc_id", "text",
          spanWords = 8, minShared = 1L, window = 4).count()
      }
      time(s"drop stride-1 #$k") {
        graft.ext.Dedup.dropCrossDocSpans(d, "doc_id", "text",
          spanWords = 8, minDocs = 2).count()
      }
      time(s"drop winnowed #$k") {
        graft.ext.Dedup.dropCrossDocSpans(d, "doc_id", "text",
          spanWords = 8, minDocs = 2, window = 4).count()
      }
    }
    spark.stop()
  }
}
