package graft

/** Plan audit for recent-round queries (dev aid): print executed
  * plans' join strategies and exchange counts.
  * `runMain graft.DevPlans [sfDir] [query...]`.
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "dev-plans")
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        // round 10
        "q_fuzzy_match", "q_fuzzy_best", "q_zorder_cells",
        "q_zorder_prune", "q_ann_ivfpq", "q_nfc_normalize",
        // round 11: persisted serve paths, winnowed faces, local BPE
        "q_admit_persisted", "q_ann_ivf_persisted", "q_ann_ivfpq_persisted",
        "q_substring_pairs_winnowed", "q_substring_dedup_winnowed",
        "q_bpe_train_local",
        // round 12: appended-store serve, drift monitor, image dHash,
        // persisted tokenizer encode
        "q_ann_ivf_appended", "q_ann_drift", "q_image_neardup",
        "q_bpe_encode_persisted", "q_ann_ivfpq_rerank_persisted")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(plan).length
      println(s"[plan] $n: exchanges=${c("Exchange")} bhj=${c("BroadcastHashJoin")} " +
        s"smj=${c("SortMergeJoin")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"scans=${c("FileScan")} dpp=${c("dynamicpruning")}")
    }
    spark.stop()
  }
}
