package graft

/** Scratch: unigramTrain timing ladder at production vocab sizes —
  * the DevBpe analogue for the EM trainer.
  * `Test/runMain graft.DevUnigram <sfDir> <vocabCsv>`.
  */
object DevUnigram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val vocabSteps = args.lift(1).getOrElse("60,1024,8192")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local(8, "dev-unigram")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[uni] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      val docs = Tables(spark, dir, "documents")
      docs.count() // warm
      vocabSteps.filter(_ <= 256).foreach { v =>
        val n = time(s"unigramTrain vocab=$v (fixture)") {
          graft.ext.UnigramTok.unigramTrain(docs, "text", v,
            seedSize = math.max(2000, v * 4)).count()
        }
        println(s"[uni] fixture vocab=$v -> $n pieces")
      }
      // DevBpe's vocabulary inflation: join adjacent word pairs twice
      // so the word vocab is production-shaped for big piece targets
      import org.apache.spark.sql.functions._
      val inflated = docs.select(regexp_replace(regexp_replace(col("text"),
        "(\\S+) (\\S+)", "$1_$2"), "(\\S+) (\\S+)", "$1_$2").as("text"))
        .localCheckpoint()
      val nV = inflated.select(explode(split(lower(col("text")), " ")))
        .distinct().count()
      println(s"[uni] inflated vocab: $nV distinct words")
      vocabSteps.foreach { v =>
        val n = time(s"unigramTrain(inflated) vocab=$v") {
          graft.ext.UnigramTok.unigramTrain(inflated, "text", v,
            seedSize = math.max(2000, v * 4)).count()
        }
        println(s"[uni] inflated vocab=$v -> $n pieces")
      }
    } catch {
      case e: Throwable =>
        println(s"[uni] FAILED: $e")
        e.printStackTrace()
    } finally spark.stop()
  }
}
