package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch profiler: nearDupClusters cost with the edge set
  * pre-materialized and cached, isolating the label-propagation
  * rounds from the LSH pair pipeline feeding them.
  * `Test/runMain graft.ext.DevClusters2 <sfDir> <cpus>`
  */
object DevClusters2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus, "graft-dev-clusters2")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { i =>
      val c = Dedup.collapsedShingleSets(docs, "doc_id", "text",
        HashDefs.ShingleN, Dedup.CollapseMode.Always)
      t(s"collapse  run$i") { c.repSets.count() }
      val edges = Dedup.minhashRepPairs(c.repSets, 0.5)
        .select("id_a", "id_b").cache()
      t(s"edges-mat run$i") { edges.count() }
      t(s"clusters  run$i") {
        Dedup.nearDupClusters(c.repSets.select(col("id")), edges)
          .filter(col("id") === col("cluster")).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
