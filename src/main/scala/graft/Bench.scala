package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall-clock at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * Each query is warmed once on sf0.001 before timing: a fresh JVM
  * otherwise charges whole-stage-codegen compilation and C2 JIT of the
  * generated classes to whichever query runs first (~10-20s of
  * constant cost unrelated to the data), which is noise for a
  * throughput measurement. Each query is then timed `SPARK_GRAFT_REPS`
  * (default 3) times at the target scale factor and the MEDIAN is
  * reported — single-run numbers at this sf carry ±10-30% plan/GC
  * noise, enough to fake a regression (BENCH_r01's n=1 did exactly
  * that). Reps run round-robin (all queries once, then again) so no
  * query is systematically advantaged by a freshly-idle JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // the engine's documented tuning profile (GraftSession: AQE pins,
    // broadcast threshold, UTC) — bench what the engine prescribes
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => }
    }
    // drop the warm-run caches so rep 1 isn't charged for them
    spark.catalog.clearCache()
    val names = SparkEntry.queries.keys.toSeq
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        // a failed query must not masquerade as a fast one
        samples(name) ::= (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      // Pipelines that cache() internally (the dedup family) leave
      // entries Spark's CacheManager would match on the NEXT rep's
      // identical plan — later reps would then time a cache read, not
      // the pipeline, and the orphaned storage would pressure every
      // subsequent query. Clear between reps so each sample is the
      // real end-to-end cost.
      spark.catalog.clearCache()
    }
    def median(xs: List[Double]): Double =
      if (xs.contains(-1.0)) -1.0
      else {
        val s = xs.sorted
        s(s.size / 2)
      }
    val results = names.map(n => n -> median(samples(n)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1 sentinels) must not SUBTRACT from the total — sum
    // the successes and list the failures explicitly
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":$reps,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
