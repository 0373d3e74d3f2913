package graft

/** Scratch: plan audit for q_admit_slice — counts the load-bearing
  * shapes (Bloom builds, joins, exchanges) in the executed plan. The
  * round-9 finding it records: a scalar-subquery Bloom probe
  * referenced by two filter branches planned 4 independent
  * bloom_filter_agg builds (no subquery reuse under AQE), which is
  * why the registry query uses Dedup.bloomProbeEager (0 builds in
  * the visible plan — one eager build at construction).
  */
object DevAdmit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "graft-dev-admit")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_admit_slice")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    def c(p: String) = p.r.findAllIn(plan).length
    println("bloom_filter_agg builds: " + c("partial_bloom_filter_agg"))
    println("might_contain probes: " + c("might_contain"))
    println("SortMergeJoin: " + c("SortMergeJoin"))
    println("Exchanges: " + c("Exchange hashpartitioning"))
    spark.stop()
  }
}
