package graft

/** Plan audit for the round-10 queries (dev aid): print executed
  * plans' join strategies and exchange counts.
  * `runMain graft.DevPlans [sfDir]`.
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "dev-plans")
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_fuzzy_match", "q_fuzzy_best", "q_zorder_cells",
      "q_zorder_prune", "q_ann_ivfpq", "q_nfc_normalize")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(plan).length
      println(s"[plan] $n: exchanges=${c("Exchange")} bhj=${c("BroadcastHashJoin")} " +
        s"smj=${c("SortMergeJoin")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"scans=${c("FileScan")}")
    }
    spark.stop()
  }
}
