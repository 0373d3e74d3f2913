package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch sub-component profiler for the corpus-prep collapse stage
  * (dev aid): isolates the row-local gate costs (langId, quality,
  * tokens, shingles, md5) from the collapse agg+join.
  * `Test/runMain graft.ext.DevPrep3 <sfDir> <cpus>`
  */
object DevPrep3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale/f10")
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus, "graft-dev-prep3")
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
      t(s"scan-only      run$i") { docs.select(length(col("text"))).agg(sum(lit(1))).head() }
      t(s"langid         run$i") { TextAnalysis.langId(docs, "text").select("lang_pred").groupBy("lang_pred").count().head() }
      t(s"quality        run$i") { docs.select(TextAnalysis.qualityScore(col("text")).as("q")).agg(avg("q")).head() }
      t(s"tokens-size    run$i") { docs.select(size(TextAnalysis.tokens(col("text"))).as("n")).agg(sum("n")).head() }
      t(s"md5-agg        run$i") { docs.select(md5(col("text")).as("d")).groupBy("d").count().agg(count(lit(1))).head() }
      t(s"shingles       run$i") { docs.select(graft.functions.TextHashFunctions.shingle_hashes(col("text"), HashDefs.ShingleN).as("hs")).select(sum(size(col("hs")))).head() }
      val kept = TextAnalysis.langId(docs, "text")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("lang_pred").isin(langs: _*) && col("quality") >= 0.3)
        .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      t(s"kept-count     run$i") { kept.count() }
      t(s"collapse-mat   run$i") {
        val c = Dedup.collapsedShingleSets(kept, "doc_id", "text",
          HashDefs.ShingleN, Dedup.CollapseMode.Always,
          carry = Seq("lang_pred", "quality", "n_tokens"))
        c.repSets.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
