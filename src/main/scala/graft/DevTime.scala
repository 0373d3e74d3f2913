package graft

import org.apache.spark.sql.SparkSession

/** Dev aid for the optimization loop (guide §1): time individual
  * registry queries in isolation with the NOOP sink — which computes
  * every column of every row and discards it — instead of the bench's
  * `count()` (kept there for cross-round comparability). Jobs are
  * labeled so the timeline attributes spans to queries.
  *
  * `runMain graft.DevTime [-count] [-explain out/dir] q_a q_b ...`
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_REPS (3; warm run on sf0.001 first, not counted).
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val useCount = args.contains("-count")
    val showJobs = args.contains("-jobs")
    val explainDir = args.sliding(2).collectFirst {
      case Array("-explain", d) => d
    }
    val names = {
      val a = args.filterNot(a => a == "-count" || a == "-jobs").toSeq
      explainDir.fold(a)(d => a.diff(Seq("-explain", d)))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-devtime")
    spark.sparkContext.setLogLevel("ERROR")
    // -jobs: per-job wall + executor-CPU attribution inside a query —
    // the "which job eats the time" answer the disabled UI would give
    val jobLog =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (showJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobLog.put(js.jobId, (js.time,
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse("")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobLog.remove(je.jobId)
          if (st != null)
            println(f"[devjob]   job ${je.jobId}%4d ${(je.time - st._1) / 1e3}%7.3f s  ${st._2}")
        }
      })
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      if (useCount) { df.count(); () }
      else df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[devtime] unknown query: $name")
        case Some(fn) =>
          try fn(spark, warmDir) match { case df => run(df) }
          catch { case scala.util.control.NonFatal(e) =>
            println(s"[devtime] $name warm FAILED: ${e.getMessage}") }
          explainDir.foreach { d =>
            val p = java.nio.file.Paths.get(d, s"$name.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            val txt = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(p,
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          val ts = (1 to reps).map { _ =>
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(s"devtime: $name")
            val t0 = System.nanoTime()
            run(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }
          spark.sparkContext.setJobDescription(null)
          println(f"[devtime] $name%-40s min=${ts.min}%7.3f  " +
            ts.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      }
    }
    spark.stop()
  }
}
