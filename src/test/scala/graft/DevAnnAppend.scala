package graft

import org.apache.spark.sql.functions._

/** Scratch profiler: what does the FROZEN quantizer cost as appends
  * accumulate — and does the drift monitor see it coming?
  * `Test/runMain graft.DevAnnAppend [sfDir]`.
  *
  * Scenario: the corpus is the fixture embeddings plus a DRIFTED
  * ingest batch (every component shifted +0.8 — a new embedding
  * model or domain, the classic silent-drift shape). Three quantizer
  * states serve the same IVF queries (nProbe = 2, k = 5, queries
  * from the drifted batch, truth = brute force over the union):
  *
  *  - `retrain`: quantizer trained on the post-drift union (the
  *               scheduled full rebuild)
  *  - `frozen`:  quantizer trained pre-drift, drifted batch appended
  *               under it (the day-N append state q_ann_ivf_appended
  *               models)
  *  - also prints the drifted batch's max-cell occupancy share and
  *    the annCellDrift PSI sum under the frozen quantizer — the
  *    q_ann_drift signal that should fire BEFORE recall is paid.
  *
  * Feeds SCALE.md §maintenance.
  */
object DevAnnAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(8, "dev-ann-append")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    import graft.functions.IvfFunctions.ivf_cells
    val base = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val n = base.count()
    // drifted ingest batch: new ids, every component shifted +0.8
    val drifted = base.select(
      (col("vec_id") + n).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.8f)).as("embedding"))
    val corpus = base.unionByName(drifted).cache()
    val q = drifted.filter(col("vec_id") < n + 50)
    val truth = Similarity.bruteForceTopK(corpus, q, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(cents: Array[Array[Double]], label: String): Unit = {
      val assigned = Similarity.withNorm(
          corpus.select(col("vec_id").as("id"), col("embedding").as("vec")))
        .withColumn("cell", element_at(ivf_cells(col("vec"), cents, 1), 1))
      val got = Similarity.ivfTopKFromIndex(assigned, cents, q, k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got intersect truth).size.toDouble / truth.size
      // where does the DRIFTED batch land under this quantizer?
      val occ = drifted
        .select(element_at(ivf_cells(col("embedding"), cents, 1), 1).as("cell"))
        .groupBy("cell").count().collect().map(_.getLong(1))
      val skew = occ.max.toDouble / occ.sum
      println(f"[annapp] $label%-8s recall@5=$recall%.3f " +
        f"driftedMaxCellShare=$skew%.3f cellsUsed=${occ.length}")
    }
    measure(Similarity.ivfCentroids(corpus, 16), "retrain")
    measure(Similarity.ivfCentroidsTrained(corpus, 16, iters = 2), "lloyd")
    measure(Similarity.ivfCentroids(base, 16), "frozen")

    // the monitor: PSI of the drifted batch vs the pre-drift store
    val dir = java.nio.file.Files.createTempDirectory("annappdev").toString
    graft.io.IndexStore.writeAnnIndexes(base, dir)
    val psi = graft.io.IndexStore.annCellDrift(spark, dir, drifted)
      .agg(sum(abs(col("psi_term")))).head().getDouble(0)
    val psiSame = graft.io.IndexStore.annCellDrift(spark, dir,
        base.filter(col("vec_id") % 3 === 0))
      .agg(sum(abs(col("psi_term")))).head().getDouble(0)
    println(f"[annapp] q_ann_drift PSI: drifted batch=$psi%.3f " +
      f"in-distribution batch=$psiSame%.3f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
