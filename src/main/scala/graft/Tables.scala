package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (TESTDATA.md):
  * one parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet's `ts` physical type has varied across fixture
      // generations (TIMESTAMP(NANOS) vs TIMESTAMP(MICROS, ntz)), so
      // adapt to whatever the reader yields instead of assuming one:
      //  - LongType: NANOS fixture read under nanosAsLong — truncate to
      //    micros, the same value DuckDB sees when it narrows NANOS.
      //  - TimestampNTZType: MICROS ntz fixture — cast to session-TZ
      //    timestamp (session TZ pinned UTC, so values are unchanged).
      //  - TimestampType: already what every downstream query expects.
      // Keep the conf set so a future NANOS fixture arrives as long
      // rather than erroring in the reader.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts arrived as unsupported type $other")
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
