package graft

import org.apache.spark.sql.functions._

/** Scratch profiler: admission from PERSISTED indexes vs the in-plan
  * ladder+quality build, `Test/runMain graft.DevIndexes <sfDir>`.
  * Feeds SCALE.md §indexes.
  */
object DevIndexes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, "dev-indexes")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[idx] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables(spark, sfDir, "documents")
    d.count() // warm
    val bucket = graft.ext.TrainingData.splitBucket(col("doc_id"), 1000)
    val seen = d.filter(bucket < 500)
    val slice = d.filter(bucket >= 500 && bucket < 600).select("doc_id", "text")

    def inPlan(): Long = {
      val seenDigests = seen.select(md5(col("text")).as("digest")).distinct()
      val exactNovel = slice.withColumn("digest", md5(col("text")))
        .join(seenDigests, Seq("digest"), "left_anti").drop("digest")
      val corpusSpans = graft.ext.Dedup.spanHashIndex(seen, "doc_id", "text", 8)
        .select("h").distinct()
      val substrHits = graft.ext.Dedup.spanHashIndex(slice, "doc_id", "text", 8)
        .join(corpusSpans, Seq("h"), "left_semi")
        .select(col("id").as("doc_id")).distinct()
      val fuzzyHits = graft.ext.Dedup
        .minhashCrossPairs(seen, slice, "doc_id", "text")
        .select(col("new_id").as("doc_id")).distinct()
      val weights = graft.ext.QualityModel.nbWeightsMicro(seen, "doc_id", "text")
      graft.ext.QualityModel.admitByModel(
          exactNovel
            .join(substrHits, Seq("doc_id"), "left_anti")
            .join(fuzzyHits, Seq("doc_id"), "left_anti"),
          weights)
        .count()
    }
    (1 to 3).foreach(k => time(s"in-plan ladder+quality #$k")(inPlan()))

    graft.io.IndexStore.resetBuilt()
    val idxDir = time("index BUILD (write all 5 artifacts)") {
      graft.io.IndexStore.ensureAdmissionIndexes(seen, sfDir)
    }
    (1 to 3).foreach { k =>
      time(s"serve from persisted indexes #$k") {
        graft.io.IndexStore.admitFromIndexes(slice, spark, idxDir).count()
      }
    }
    spark.stop()
  }
}
