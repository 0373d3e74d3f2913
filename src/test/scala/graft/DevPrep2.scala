package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch micro-stage profiler replicating CorpusPipeline.prepare's
  * exact composition with an action after each eager boundary (dev
  * aid). `Test/runMain graft.ext.DevPrep2 <sfDir> <cpus>`
  */
object DevPrep2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus, "graft-dev-prep2")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    val langs = Seq("en", "de", "fr", "es", "zh")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { i =>
      val kept = TextAnalysis.langId(docs, "text")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("lang_pred").isin(langs: _*) && col("quality") >= 0.3)
        .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      val collapse = Dedup.collapsedShingleSets(kept, "doc_id", "text",
        HashDefs.ShingleN, Dedup.CollapseMode.Always,
        carry = Seq("lang_pred", "quality", "n_tokens"))
      t(s"collapse-mat run$i") { collapse.repSets.count() }
      val pairs = t(s"lsh-pairs    run$i") {
        val p = Dedup.minhashRepPairs(collapse.repSets, 0.5).select("id_a", "id_b")
        p.count(); p
      }
      val reps = t(s"clusters     run$i") {
        val r = Dedup.nearDupClusters(collapse.repSets.select(col("id")), pairs)
          .filter(col("id") === col("cluster")).select("id")
        r.count(); r
      }
      t(s"surv+split   run$i") {
        val survivors = collapse.repAttrs.get.join(reps, Seq("id"), "left_semi")
        TrainingData.withSplit(survivors, col("id"))
          .select(col("id").as("doc_id"), col("lang_pred"), col("quality"),
            col("n_tokens"), col("split_bucket"), col("split")).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
