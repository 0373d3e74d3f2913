package graft

/** Scratch thread-count sensitivity probe for the dedup family (dev
  * aid): times selected registry queries at a given parallelism.
  * `Test/runMain graft.DevThreads <cpus> <sfDir>`
  */
object DevThreads {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cpus, s"graft-dev-threads-$cpus")
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_dedup_ngram", "q_containment", "q_dedup_minhash",
      "q_corpus_prepare")
    // warm
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    (1 to 3).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[prof] cpus=$cpus $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
