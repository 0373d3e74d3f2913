package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables

/** Typed facades over the testdata tables (SURVEY.md §1.4: `Dataset
  * [CaseClass]` where type safety aids testing/API ergonomics; the
  * untyped `DataFrame` path via [[graft.Tables]] stays primary —
  * schemas there are dynamic by design).
  */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

final case class Document(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

final case class Embedding(
    vec_id: Long,
    embedding: Array[Float],
    label: Int)

object Models {
  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables(spark, sfDir, "events").as[Event]
  }

  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, sfDir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, sfDir, "embeddings").as[Embedding]
  }
}
