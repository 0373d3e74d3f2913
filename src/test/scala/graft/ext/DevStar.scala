package graft.ext

import org.apache.spark.sql.functions._

/** Dev aid: search for a block-tag family whose star fixture (hub =
  * three blocks, leaves = each 2-of-3) yields EXACTLY the three
  * hub-leaf edges under the repo's MinHash banding — the
  * CorpusPipelineSpec ranked-policy fixture is deterministic once
  * chosen, but banding at J≈0.65 misses ~20% of edges per hash
  * family, so the tags must be picked to land. `Test/runMain graft.ext.DevStar`.
  */
object DevStar {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "dev-star")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cands = Seq(
      ("alpha", "beta", "gamma"), ("delta", "epsilon", "zeta"),
      ("river", "stone", "cloud"), ("north", "south", "east"),
      ("copper", "silver", "golden"), ("maple", "cedar", "willow"),
      ("falcon", "heron", "sparrow"), ("amber", "coral", "jade"))
    for ((ta, tb, tc) <- cands) {
      def block(tag: String): String =
        (1 to 10).map(j => s"the $tag$j of").mkString(" ")
      val (a, b, c) = (block(ta), block(tb), block(tc))
      val docs = Seq(
        (1L, s"$a $b"), (2L, s"$a $b $c"), (3L, s"$b $c"), (4L, s"$a $c")
      ).toDF("doc_id", "text")
      val sets = Dedup.docShingleSets(docs, "doc_id", "text")
      val pairs = Dedup.minhashRepPairs(
          sets.select(col("id"), col("hs")), minJaccard = 0.5)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val star = pairs == Seq((1L, 2L), (2L, 3L), (2L, 4L))
      println(s"[$ta/$tb/$tc] pairs=${pairs.mkString(",")} star=$star")
    }
    spark.stop()
  }
}
