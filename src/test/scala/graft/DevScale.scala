package graft

import org.apache.spark.sql.functions._

/** Scale-validation harness for the dedup family (dev aid, verdict r5
  * task #6): generates a factor-f corpus from sf0.1 documents with a
  * planted 20% duplicate-clique population, then times the five
  * pairwise/pipeline queries on it.
  *
  * Generation (`gen <f> <outDir>`): every source document yields f
  * copies. Docs with `doc_id % 5 == 0` (20%) keep their text VERBATIM
  * in every copy — a planted exact-duplicate clique of size f, the
  * web-boilerplate shape the collapse front exists for. All other
  * copies beyond the first get every word suffixed with the copy
  * index, which rewrites every shingle — fully distinct documents,
  * not accidental near-dups. Written as 32 files so the scan starts
  * parallel (the realistic multi-split layout).
  *
  * Timing (`run <sfDir> [reps]`): times each query cold (cache
  * cleared between queries) and reports per-rep seconds; scaling
  * exponents between two corpus sizes are log(tB/tA)/log(nB/nA).
  */
object DevScale {
  private val queries = Seq("q_dedup_ngram", "q_dedup_minhash",
    "q_containment", "q_dedup_clusters", "q_corpus_prepare")

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: f :: outDir :: Nil => gen(f.toInt, outDir)
    case "run" :: sfDir :: rest =>
      run(sfDir, rest.headOption.map(_.toInt).getOrElse(3))
    case _ =>
      System.err.println("usage: DevScale gen <factor> <outDir> | run <sfDir> [reps]")
      sys.exit(2)
  }

  private def gen(f: Int, outDir: String): Unit = {
    val spark = GraftSession.local(32, s"graft-dev-scale-gen-$f")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val out = docs
      .select(col("*"), explode(sequence(lit(0), lit(f - 1))).as("c"))
      .select(
        (col("doc_id") * f + col("c")).as("doc_id"),
        when(col("doc_id") % 5 === 0 || col("c") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              w => concat(w, lit("~"), col("c"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    out.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[gen] factor=$f rows=$n -> $outDir/documents.parquet")
    spark.stop()
  }

  private def run(sfDir: String, reps: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/classload warm-up on the tiny corpus, then measure cold
    queries.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      queries.foreach { q =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"[scale] $sfDir $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
