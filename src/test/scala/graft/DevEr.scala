package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution scale ladder (dev aid): candidate volume and
  * wall for the blocked fuzzy join as the corpus grows — the number
  * that proves blocking keeps the verify stage under n·m.
  * `runMain graft.DevEr <docsDir> [reps]` (docsDir = a dir holding
  * documents.parquet, e.g. /root/testdata/sf0.1 or a DevScale gen).
  */
object DevEr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32, "graft-dev-er")
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables(spark, dir, "documents")
    val n = d.count()
    val blockLen = args.lift(2).map(_.toInt)
      .getOrElse(graft.ops.EntityResolution.blockerLenFor(n))
    // blockLen -1 = token-signature mode (the orthogonal pass)
    val blockers =
      if (blockLen == -1) Seq(graft.ops.EntityResolution.tokenSignatureBlocker())
      else graft.ops.EntityResolution.prefixSuffixBlockers(blockLen)
    val clean = d.select(col("doc_id"), substring(col("text"), 1, 40).as("k"))
    val dirty = d.filter(col("doc_id") % 3 === 0).select(col("doc_id"),
      regexp_replace(substring(col("text"), 1, 40), "(.{9}).", "$1").as("k"))
    val m = dirty.count()

    // candidate volume BEFORE the verify (the blocked join's output)
    def cands(l: DataFrame, r: DataFrame): Long =
      graft.ops.EntityResolution.fuzzyJoin(
        l, r, "doc_id", "k", "doc_id", "k", minSim = -1.0, blockers).count()
    val cand = cands(dirty, clean)
    println(f"[er] $dir n=$n m=$m blockLen=$blockLen candidates=$cand " +
      f"(cross=${n * m} ratio=${cand.toDouble / (n * m)}%.5f)")

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val best = graft.ops.EntityResolution.bestMatches(
        graft.ops.EntityResolution.fuzzyJoin(
          dirty, clean, "doc_id", "k", "doc_id", "k", minSim = 0.9, blockers))
      val hits = best.count()
      // recall proxy: resolved records whose winner is the true source
      val correct = best.filter(col("id_l") === col("id_r")).count()
      println(f"[er] $dir blockLen=$blockLen run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"($hits resolved, $correct self)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
