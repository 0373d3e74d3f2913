package graft
import org.apache.spark.sql.SparkSession
object DevGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "dev-gate")
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Tables(spark, sfDir, "lineitem").count()
    for (parts <- Seq("32", "8", "4"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"closed_sessions parts=$parts rep$rep") {
        graft.streaming.StreamingGate.closedSessionsFromFiles(spark, sfDir).count()
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
