package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for hot queries (dev aid, not part of the driver
  * contract). `runMain graft.DevProfile <sfDir>`.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    Tables(spark, sfDir, "lineitem").count()

    val docs = Tables(spark, sfDir, "documents")
    time("shingle hashes (explode+md5+distinct)") {
      graft.ext.Dedup.wordShingleHashes(docs, "doc_id", "text").count()
    }
    time("shingle hashes 2nd") {
      graft.ext.Dedup.wordShingleHashes(docs, "doc_id", "text").count()
    }
    val sh = graft.ext.Dedup.wordShingleHashes(docs, "doc_id", "text").cache()
    sh.count()
    time("self-join+jaccard on cached shingles") {
      import org.apache.spark.sql.functions._
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
      sh.as("a").join(sh.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(count(lit(1)).as("shared"))
        .join(broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a")), Seq("id_a"))
        .join(broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b")), Seq("id_b"))
        .filter(col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")) >= 0.5)
        .count()
    }
    time("minhash signature (expr)") {
      graft.ext.Dedup.minhashSignature(
        graft.ext.Dedup.docShingleSets(docs, "doc_id", "text")).count()
    }
    time("minhash full") {
      graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
    }
    time("minhash full 2nd") {
      graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
    }
    time("minhash full 3rd") {
      graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
    }
    time("ngram full") {
      graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
    }
    time("ngram full 2nd") {
      graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
    }
    val emb = Tables(spark, sfDir, "embeddings")
    time("embed_neardup (vec_dot)") {
      graft.ext.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.45).count()
    }
    time("ann brute topk") {
      graft.ext.Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5).count()
    }
    (1 to 3).foreach { i =>
      time(s"ann lsh topk run$i") {
        graft.ext.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 5).count()
      }
    }
    spark.stop()
  }
}
