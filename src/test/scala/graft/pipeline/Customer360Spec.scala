package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.io.ParquetSink

/** End-to-end golden test of the full reference pipeline (SURVEY.md §5
  * #4): reference-shaped fixtures on disk — YYYYMMDD.json viewing
  * logs, YYYYMMDD parquet search-log folders, mapping.csv — through
  * both branches, the zip-merge, and a sink.
  */
class Customer360Spec extends SparkSpec {
  import spark.implicits._

  private lazy val root: java.io.File = {
    val dir = Files.createTempDirectory("graft-pipe").toFile
    dir.deleteOnExit()

    // --- interaction fixtures: 2 day files of _source-wrapped JSON
    val content = new java.io.File(dir, "log_content"); content.mkdir()
    def j(c: String, mac: String, app: String, dur: Long): String =
      s"""{"_source": {"Contract": "$c", "Mac": "$mac", "AppName": "$app", "TotalDuration": $dur}}"""
    Files.writeString(new java.io.File(content, "20220401.json").toPath, Seq(
      j("c1", "m1", "CHANNEL", 100),
      j("c1", "m1", "VOD", 50),
      j("c2", "m2", "SPORT", 10),
      j("c3", "m3", "CHILD", 30),
      j("0", "mx", "CHANNEL", 5),   // junk contract sentinel → dropped
      j("c4", "m4", "BOGUS", 7)     // unknown app only → dropped from profile
    ).mkString("\n"))
    Files.writeString(new java.io.File(content, "20220402.json").toPath, Seq(
      j("c1", "m1b", "CHANNEL", 25),
      j("c2", "m2", "SPORT", 5)
    ).mkString("\n"))

    // --- behavior fixtures: 2 day folders of parquet search logs
    val search = new java.io.File(dir, "log_search"); search.mkdir()
    Seq(
      ("2022-06-01 10:00:00", "u1", "phone"),
      ("2022-06-01 11:00:00", "u1", "phone"),
      ("2022-06-01 12:00:00", "u1", "tv"),
      ("2022-06-01 13:00:00", "u2", "laptop"),
      ("2022-06-01 14:00:00", "u3", "camera")) // u3 has no month-7 → dropped
      .toDF("datetime", "user_id", "keyword")
      .coalesce(1).write.parquet(s"$search/20220601")
    Seq(
      ("2022-07-01 10:00:00", "u1", "tv"),
      ("2022-07-01 11:00:00", "u2", "laptop"))
      .toDF("datetime", "user_id", "keyword")
      .coalesce(1).write.parquet(s"$search/20220701")

    // --- mapping dim (camera intentionally unmapped)
    Files.writeString(new java.io.File(dir, "mapping.csv").toPath,
      "search,category\nphone,electronics\ntv,electronics\nlaptop,computers\n")
    dir
  }

  private def cfg = Customer360.Config(
    logContentDir = s"$root/log_content",
    logSearchDir = s"$root/log_search",
    mappingPath = s"$root/mapping.csv")

  test("interaction branch: hand-computed profile") {
    val out = interactionByContract
    out.keySet shouldBe Set("c1", "c2", "c3")
    // c1: Truyen_hinh 125 (CHANNEL 100+25), Phim_truyen 50, devices m1+m1b,
    // 2 active days → very low; totals [15,30,175] → q1 22.5, median 30;
    // very low & 175 ≥ 22.5 → anomaly
    val c1 = out("c1")
    c1.getAs[Long]("Total_Truyen_hinh") shouldBe 125L
    c1.getAs[Long]("Total_Phim_truyen") shouldBe 50L
    c1.getAs[Long]("TotalDevices") shouldBe 2L
    c1.getAs[String]("Activeness") shouldBe "very low"
    c1.getAs[String]("MostWatch") shouldBe "Truyen_hinh"
    c1.getAs[String]("CustomerTaste") shouldBe "Phim_truyen-Truyen_hinh"
    c1.getAs[String]("CustomerType") shouldBe "anomaly"
    // c2: 15 total < q1 22.5, very low → leaving
    out("c2").getAs[String]("CustomerType") shouldBe "leaving"
    // c3: 30 ≥ 22.5, very low → anomaly
    out("c3").getAs[String]("CustomerType") shouldBe "anomaly"
  }

  private def interactionByContract: Map[String, Row] = {
    val df = Customer360.interactionBranch(spark, cfg)
    df.collect().map(r => r.getAs[String]("Contract") -> r).toMap
  }

  test("behavior branch: trends with category lookup") {
    val rows = Customer360.behaviorBranch(spark, cfg).collect()
      .map(r => r.getAs[String]("user_id") -> r).toMap
    rows.keySet shouldBe Set("u1", "u2") // u3 dropped by month self-join
    val u1 = rows("u1")
    u1.getAs[String]("most_search_month_6") shouldBe "phone"
    u1.getAs[String]("most_search_month_7") shouldBe "tv"
    u1.getAs[String]("category_t6") shouldBe "electronics"
    u1.getAs[String]("Trending_Type") shouldBe "Unchanged"
    rows("u2").getAs[String]("Previous") shouldBe "Unchanged"
  }

  test("full pipeline: zip-merge + sink roundtrip, deterministic across runs") {
    val outDir = new java.io.File(root, "out.parquet").getAbsolutePath
    val merged = Customer360.run(spark, cfg, ParquetSink(outDir))
    merged.columns should contain allOf ("Contract", "CustomerType",
      "most_search_month_6", "Trending_Type", "Previous")
    merged.columns should not contain "user_id" // dropped by the zip-join
    val persisted = spark.read.parquet(outDir)
    persisted.count() shouldBe 2L // min(3 interaction, 2 behavior)
    // deterministic zip: sorted contracts pair with sorted user order
    val firstRun = persisted.collect()
    val byContract = firstRun.map(r => r.getAs[String]("Contract") -> r).toMap
    byContract("c1").getAs[String]("most_search_month_6") shouldBe "phone"
    byContract("c2").getAs[String]("most_search_month_6") shouldBe "laptop"
    // run twice → identical rows (materialize before the overwrite)
    val firstRows = firstRun.map(_.toSeq).toSet
    val again = Customer360.run(spark, cfg, ParquetSink(outDir))
    rowSet(again) shouldBe firstRows
  }
}
