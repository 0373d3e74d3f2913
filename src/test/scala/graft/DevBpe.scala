package graft

/** Scratch: bpeTrain vs bpeTrainLocal timing ladder on the sf tables.
  * `Test/runMain graft.DevBpe <sfDir> <mergesCsv>`.
  */
object DevBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mergeSteps = args.lift(1).getOrElse("20,1024,8192")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.local(8, "dev-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      val docs = Tables(spark, dir, "documents")
      docs.count() // warm
      val distributed = time("bpeTrain(distributed) merges=20") {
        graft.ext.TextAnalysis.bpeTrain(docs, "text", 20).collect().toSeq
      }
      mergeSteps.foreach { m =>
        val local = time(s"bpeTrainLocal merges=$m") {
          graft.ext.TextAnalysis.bpeTrainLocal(docs, "text", m).collect().toSeq
        }
        println(s"[bpe] local merges=$m learned ${local.size} rules" +
          (if (m == 20) s", equal to distributed: ${local == distributed}" else ""))
      }
      // the synthetic fixture's word vocabulary exhausts after <100
      // merges; join adjacent word pairs into compound tokens to get a
      // production-sized vocabulary for the large-merge-count ladder
      import org.apache.spark.sql.functions._
      val inflated = docs.select(regexp_replace(regexp_replace(col("text"),
        "(\\S+) (\\S+)", "$1_$2"), "(\\S+) (\\S+)", "$1_$2").as("text"))
      val nV = inflated.select(explode(split(lower(col("text")), " ")))
        .distinct().count()
      println(s"[bpe] inflated vocab: $nV distinct words")
      mergeSteps.foreach { m =>
        val local = time(s"bpeTrainLocal(inflated) merges=$m") {
          graft.ext.TextAnalysis.bpeTrainLocal(inflated, "text", m).count()
        }
        println(s"[bpe] inflated merges=$m learned $local rules")
      }
    } catch {
      case e: Throwable =>
        println(s"[bpe] FAILED: $e")
        e.printStackTrace()
    }
    spark.stop()
  }
}
