package graft

import org.apache.spark.sql.functions._

/** Scratch: print the executed-plan node classes of a non-bucketed
  * merge join so BucketedSpec's mutation-proof pins match reality.
  */
object DevBkt {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-dev-bkt")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val l = (1L to 100L).map(i => (i, i * 2)).toDF("k", "lv").repartition(5)
    val r = (50L to 150L).map(i => (i, s"r$i")).toDF("k2", "rv").repartition(5)
    val j = l.hint("merge").join(r.hint("merge"), col("k") === col("k2"))
    j.collect()
    val p = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println(p.treeString)
    p.foreach(n => println(n.getClass.getName))
    spark.stop()
  }
}
