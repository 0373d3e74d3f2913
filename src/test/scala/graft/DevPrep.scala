package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the corpus-prep pipeline (dev aid, not
  * part of the driver contract). `Test/runMain graft.DevPrep <sfDir>`
  * — times each stage of [[CorpusPipeline.prepare]] in
  * isolation, then the whole composition, cache cleared between runs.
  */
object DevPrep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(args.drop(1).headOption.map(_.toInt).getOrElse(8), "graft-dev-prep")
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    val langs = Seq("en", "de", "fr", "es", "zh")

    (1 to 3).foreach { i =>
      val kept = TextAnalysis.langId(docs, "text")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("lang_pred").isin(langs: _*) && col("quality") >= 0.3)
      time(s"gates       run$i") { kept.count() }
      val collapse = Dedup.collapsedShingleSets(kept, "doc_id", "text",
        HashDefs.ShingleN, Dedup.CollapseMode.Always)
      time(s"collapse    run$i") { collapse.repSets.count() }
      val edges = Dedup.minhashRepPairs(collapse.repSets, 0.5)
        .select("id_a", "id_b")
      time(s"lsh-edges   run$i") { edges.count() }
      val reps = Dedup.nearDupClusters(
          collapse.repSets.select(col("id")), edges)
        .filter(col("id") === col("cluster"))
      time(s"clusters    run$i") { reps.count() }
      spark.catalog.clearCache()
      time(s"prepare e2e run$i") {
        CorpusPipeline.prepare(docs, "doc_id", "text", langs, 0.3).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
