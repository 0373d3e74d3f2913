package graft

import org.apache.spark.sql.functions._

/** PQ vs IVF-PQ wall at query load (dev aid): the cell restriction's
  * value is per-query scan cost, so it shows under MANY queries, not
  * the registry's 10. `runMain graft.DevIvfPq <embDir> [nQueries] [reps]`.
  */
object DevIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(500)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(32, "dev-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < nq)
    println(s"[ivfpq] corpus=${e.count()} queries=${q.count()}")
    def time(name: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[ivfpq] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("pq      ") { graft.ext.Similarity.pqTopK(e, q, k = 5).count() }
    time("ivfpq p2") { graft.ext.Similarity.ivfPqTopK(e, q, k = 5,
      nProbe = 2).count() }
    time("ivfpq p4") { graft.ext.Similarity.ivfPqTopK(e, q, k = 5,
      nProbe = 4).count() }
    spark.stop()
  }
}
