package graft.schema

import org.apache.spark.sql.types._

/** Pinned schemas for the engine's inputs.
  *
  * The reference infers every schema at read time
  * (ETL_pipeline.py:32 json, :302 csv, :316 parquet). Inference is
  * non-deterministic across file subsets (a day whose `TotalDuration`
  * values all fit in int infers IntegerType, another day LongType, and
  * the unionByName then fails), and at 100 TB an inference pass is a
  * full extra scan of the data. We pin explicit StructTypes and keep
  * inference available behind [[graft.io.Sources]] options.
  */
object Schemas {

  /** `log_content` — daily JSON viewing logs, one file per day named
    * `YYYYMMDD.json`, payload nested under an Elasticsearch-style
    * `_source` envelope (ETL_pipeline.py:255).
    */
  val logContentSource: StructType = StructType(Seq(
    StructField("Contract",      StringType), // junk sentinel "0" filtered (ETL_pipeline.py:73)
    StructField("Mac",           StringType), // device id (ETL_pipeline.py:42-43)
    StructField("AppName",       StringType), // CHANNEL|DSHD|KPLUS|VOD|FIMS|SPORT|RELAX|CHILD|junk (ETL_pipeline.py:64-72)
    StructField("TotalDuration", LongType)    // watch seconds (ETL_pipeline.py:82)
  ))

  val logContent: StructType =
    StructType(Seq(StructField("_source", logContentSource)))

  /** `log_search` — daily Parquet search logs, one folder per day
    * (ETL_pipeline.py:305-306,317-321).
    */
  val logSearch: StructType = StructType(Seq(
    StructField("datetime", StringType), // to_date()-parseable (ETL_pipeline.py:318)
    StructField("user_id",  StringType),
    StructField("keyword",  StringType)
  ))

  /** `mapping` — keyword→category CSV dim with header
    * (ETL_pipeline.py:302).
    */
  val mapping: StructType = StructType(Seq(
    StructField("search",   StringType),
    StructField("category", StringType)
  ))
}
