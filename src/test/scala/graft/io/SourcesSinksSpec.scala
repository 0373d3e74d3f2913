package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.Schemas

/** Source/sink surface (SURVEY.md §2.1): dated-file listing and
  * range-pruning, filename→date extraction, pinned-schema reads, the
  * `_source` envelope flatten, JDBC option assembly, parquet double.
  */
class SourcesSinksSpec extends SparkSpec {

  private def tempDir(): java.io.File = {
    val d = Files.createTempDirectory("graft-test").toFile
    d.deleteOnExit()
    d
  }

  private def writeFile(dir: java.io.File, name: String, content: String): Unit = {
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.deleteOnExit()
  }

  test("listDatedFiles: keeps files whose YYYYMMDD basename is in range, sorted") {
    val dir = tempDir()
    Seq("20220401.json", "20220402.json", "20220430.json", "20220501.json",
      "notadate.json", "20220410.txt").foreach(writeFile(dir, _, "{}"))
    val got = Sources.listDatedFiles(spark, dir.getAbsolutePath,
      20220401, 20220415, suffix = ".json")
    got.map(p => new java.io.File(p).getName) shouldBe
      Seq("20220401.json", "20220402.json")
  }

  test("listDatedFiles: missing directory yields empty, no suffix matches folders too") {
    Sources.listDatedFiles(spark, "/nonexistent/graft", 0, 99999999) shouldBe empty
    val dir = tempDir()
    new java.io.File(dir, "20220601").mkdir()
    new java.io.File(dir, "20220713").mkdir()
    new java.io.File(dir, "extras").mkdir()
    val got = Sources.listDatedFiles(spark, dir.getAbsolutePath, 20220601, 20220630)
    got.map(p => new java.io.File(p).getName) shouldBe Seq("20220601")
  }

  test("readLogContent: multi-path JSON read flattens _source and injects file date") {
    val dir = tempDir()
    writeFile(dir, "20220401.json",
      """{"_source": {"Contract": "c1", "Mac": "m1", "AppName": "CHANNEL", "TotalDuration": 10}}""")
    writeFile(dir, "20220402.json",
      """{"_source": {"Contract": "c2", "Mac": "m2", "AppName": "VOD", "TotalDuration": 20}}
        |{"_source": {"Contract": "c3", "Mac": "m3", "AppName": "RELAX", "TotalDuration": 30}}""".stripMargin)
    val out = Sources.readLogContent(spark, dir.getAbsolutePath, 20220401, 20220402)
    out.columns.toSeq shouldBe Seq("Contract", "Mac", "AppName", "TotalDuration", "Date")
    rowSet(out.select(col("Contract"), col("TotalDuration"),
      date_format(col("Date"), "yyyyMMdd"))) shouldBe Set(
      Seq("c1", 10L, "20220401"),
      Seq("c2", 20L, "20220402"),
      Seq("c3", 30L, "20220402"))
  }

  test("readJson: corrupt rows surface as nulls under PERMISSIVE, not dropped files") {
    val dir = tempDir()
    writeFile(dir, "20220401.json",
      """{"_source": {"Contract": "c1", "Mac": "m1", "AppName": "VOD", "TotalDuration": 1}}
        |this is not json""".stripMargin)
    val out = Sources.readJson(spark, Schemas.logContent,
      Seq(new java.io.File(dir, "20220401.json").getAbsolutePath))
    out.count() shouldBe 2L // both rows present; corrupt one has null _source
    out.filter(col("_source").isNull).count() shouldBe 1L
  }

  test("readJson/readParquet: empty path list aborts like the reference") {
    an[IllegalArgumentException] should be thrownBy
      Sources.readJson(spark, Schemas.logContent, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Sources.readParquet(spark, Seq.empty)
  }

  test("readCsv: pinned schema, header skipped") {
    val dir = tempDir()
    writeFile(dir, "mapping.csv", "search,category\nk1,catA\nk2,catB\n")
    val out = Sources.readCsv(spark, Schemas.mapping,
      new java.io.File(dir, "mapping.csv").getAbsolutePath)
    rowSet(out) shouldBe Set(Seq("k1", "catA"), Seq("k2", "catB"))
  }

  test("readBinaryFiles: glob filter, content bytes, size guard") {
    val dir = tempDir()
    writeFile(dir, "a.bin", "hello")
    writeFile(dir, "big.bin", "x" * 100)
    writeFile(dir, "skip.txt", "nope")
    val out = Sources.readBinaryFiles(spark, dir.getAbsolutePath,
      pathGlob = "*.bin", maxBytes = 50)
    val rows = out.select("path", "length", "content").collect()
    rows.length shouldBe 1 // txt excluded by glob, big.bin by maxBytes
    new String(rows.head.getAs[Array[Byte]]("content"), "UTF-8") shouldBe "hello"
  }

  test("JdbcSink: url and option assembly (ETL_pipeline.py:198-211 contract)") {
    JdbcSink.sqlServerUrl("h", "1433", "db") shouldBe
      "jdbc:sqlserver://h:1433;databaseName=db"
    val sink = JdbcSink("jdbc:sqlserver://h:1433;databaseName=db", "t",
      "com.microsoft.sqlserver.jdbc.SQLServerDriver", "u", "p")
    sink.options("dbtable") shouldBe "t"
    sink.options("driver") shouldBe "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    sink.options("batchsize") shouldBe "10000"
  }

  test("JdbcSink: end-to-end write -> read-back round-trip (embedded Derby)") {
    // The reference's sink is Azure SQL Server (ETL_pipeline.py:198-211);
    // the e2e proof here runs the SAME sink code against an embedded
    // Derby database (on Spark's own classpath) — real JDBC writes with
    // Overwrite semantics, partitioned connections, and a typed
    // read-back, no cloud required.
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val df = Seq(
      (1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)
    ).toDF("id", "name", "score")
    val sink = JdbcSink(url, "graft_rt", driver, user = "", password = "",
      numPartitions = 2)
    sink.write(df)
    // Overwrite must actually overwrite, not append
    sink.write(df)
    val back = spark.read.format("jdbc")
      .options(Map("url" -> url, "dbtable" -> "graft_rt", "driver" -> driver))
      .load()
    back.schema.fieldNames.toSeq shouldBe Seq("id", "name", "score")
    rowSet(back) shouldBe Set(
      Seq(1L, "alpha", 1.5), Seq(2L, "beta", 2.5), Seq(3L, "gamma", 3.5))
  }

  test("PartitionedParquetSink + readDatePartitioned: range prunes partitions") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "dated.parquet").getAbsolutePath
    val df = Seq(
      (20220401, "a", 1L), (20220402, "b", 2L),
      (20220403, "c", 3L), (20220501, "d", 4L)
    ).toDF("date", "k", "v")
    PartitionedParquetSink(dir).write(df)
    // partition directories exist
    new java.io.File(dir, "date=20220401").isDirectory shouldBe true
    val read = Sources.readDatePartitioned(spark, dir, 20220402, 20220430)
    rowSet(read.select("date", "k", "v")) shouldBe
      Set(Seq(20220402, "b", 2L), Seq(20220403, "c", 3L))
    // pruning reaches the scan: the range predicate sits in the scan's
    // PartitionFilters (file-index pruning), not in a post-scan Filter
    val plan = read.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    plan should include("PartitionFilters")
    plan should include("(date#")
    withClue(plan) {
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains(">= 20220402")) shouldBe true
    }
  }

  test("BucketedTableSink: same-bucketed tables join with NO shuffle exchange") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    BucketedTableSink("graft_bkt_l", Seq("k"), nBuckets = 4).write(left)
    BucketedTableSink("graft_bkt_r", Seq("k"), nBuckets = 4).write(right)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the assertion is about bucketing,
      // not about the broadcast path also having no shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan should not include "Exchange hashpartitioning"
      }
      joined.count() shouldBe 100L
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }

  test("ParquetSink: roundtrip write/read") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "out.parquet").getAbsolutePath
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    ParquetSink(dir).write(df)
    rowSet(spark.read.parquet(dir)) shouldBe Set(Seq(1, "a"), Seq(2, "b"))
  }

  test("EpochParquetSink: a replayed epoch overwrites ONLY its own partition") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "epochs.parquet").getAbsolutePath
    val sink = EpochParquetSink(dir)
    sink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .withColumn("batch_id", lit(0L)))
    sink.write(Seq((3L, "c")).toDF("id", "v")
      .withColumn("batch_id", lit(1L)))
    // epoch 1 replays with different content (the at-least-once case):
    // its partition is REPLACED, epoch 0's rows untouched
    sink.write(Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      .withColumn("batch_id", lit(1L)))
    rowSet(spark.read.parquet(dir).select("id", "v")) shouldBe
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d"))
    an[IllegalArgumentException] should be thrownBy
      sink.write(Seq((9L, "x")).toDF("id", "v"))
    // the replay guard: committed only for epochs with durable part
    // files; a never-written sink reads as "no epoch committed" (the
    // valid-empty case, not a read error)
    sink.committed(0L) shouldBe true
    sink.committed(1L) shouldBe true
    sink.committed(5L) shouldBe false
    sink.anyCommitted shouldBe true
    EpochParquetSink(
      new java.io.File(tempDir(), "never").getAbsolutePath)
      .anyCommitted shouldBe false
  }

  test("EpochParquetSink: durability IS the marker — a half-moved " +
      "partition reads uncommitted; debris never throws; empty epochs " +
      "commit without data") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "epochs2.parquet").getAbsolutePath
    val sink = EpochParquetSink(dir)
    // writeEpoch stamps the partition column and marks in one call
    sink.writeEpoch(Seq((1L, "a")).toDF("id", "v"), 0L)
    sink.committed(0L) shouldBe true
    sink.committedEpochs shouldBe Seq(0L)
    sink.dataEpochs shouldBe Seq(0L)
    // the partition column reads back via directory-name inference
    spark.read.parquet(dir)
      .select(col("id"), col("batch_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 0L))
    // a committed-but-empty epoch: marker lands, no partition dir —
    // dataEpochs (what row readers gate on) skips it
    sink.writeEpoch(Seq.empty[(Long, String)].toDF("id", "v"), 9L)
    sink.committed(9L) shouldBe true
    sink.committedEpochs shouldBe Seq(0L, 9L)
    sink.dataEpochs should not contain 9L
    // ...and the empty dynamic overwrite left epoch 0's rows intact
    spark.read.parquet(dir).select("id").as[Long].collect().toSeq shouldBe
      Seq(1L)
    // the partial-commit hazard the marker closes: a crash during the
    // committer's move phase leaves part files WITHOUT a marker — the
    // epoch must read as uncommitted (recompute + dynamic overwrite),
    // never as durable
    val half = new java.io.File(dir, "batch_id=7")
    half.mkdirs()
    new java.io.File(half, "part-00000-dead.parquet").createNewFile()
    sink.committed(7L) shouldBe false
    sink.committedEpochs shouldBe Seq(0L, 9L)
    sink.dataEpochs shouldBe Seq(0L, 7L) // listing only — no parse, no read
    // unparsable debris (null-key partitions, stray files) is ignored
    new java.io.File(dir, "batch_id=__HIVE_DEFAULT_PARTITION__").mkdirs()
    new java.io.File(dir, "_committed_junk").createNewFile()
    sink.committedEpochs shouldBe Seq(0L, 9L)
    noException should be thrownBy sink.dataEpochs
  }

  test("EpochParquetSink.purgeIds: rewrites ONLY the epochs holding " +
      "deleted rows; markers and untouched epochs' files survive") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "epochs3.parquet").getAbsolutePath
    val sink = EpochParquetSink(dir)
    sink.writeEpoch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    sink.writeEpoch(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), 1L)
    sink.writeEpoch(Seq((2L, "b2"), (5L, "e")).toDF("id", "v"), 2L)
    val untouched = new java.io.File(dir, "batch_id=1").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    // takedown docs 2 (epochs 0 and 2) and 9 (nowhere)
    val affected = sink.purgeIds(spark, "id", Seq(2L, 9L).toDF("doc_id"))
    affected shouldBe Seq(0L, 2L)
    // content redacted, everything else intact
    rowSet(spark.read.parquet(dir).select("id", "v")) shouldBe
      Set(Seq(1L, "a"), Seq(3L, "c"), Seq(4L, "d"), Seq(5L, "e"))
    // epoch 1's files were never rewritten (same names + mtimes)
    new java.io.File(dir, "batch_id=1").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap shouldBe untouched
    // durability markers survive — the epochs stay committed (their
    // content is redacted, not replayed)
    sink.committedEpochs shouldBe Seq(0L, 1L, 2L)
    // a takedown hitting nothing rewrites nothing
    sink.purgeIds(spark, "id", Seq(99L).toDF("doc_id")) shouldBe Seq.empty
  }

  test("EpochParquetSink.purgeIds: entry guard fails loud on BOTH " +
      "interrupted-purge crash windows, before any new rewrite") {
    import spark.implicits._
    // window 1: crash BETWEEN the renames — the live partition is
    // gone (dataEpochs skips it; a per-epoch hit check would never
    // run), only .old_<k> holds the epoch's rows
    val dir1 = new java.io.File(tempDir(), "epochs4.parquet").getAbsolutePath
    val sink1 = EpochParquetSink(dir1)
    sink1.writeEpoch(Seq((1L, "a")).toDF("id", "v"), 0L)
    sink1.writeEpoch(Seq((2L, "b")).toDF("id", "v"), 1L)
    new java.io.File(dir1, "batch_id=1")
      .renameTo(new java.io.File(dir1, ".old_1")) shouldBe true
    val e1 = intercept[IllegalArgumentException] {
      sink1.purgeIds(spark, "id", Seq(1L).toDF("doc_id"))
    }
    e1.getMessage should include(".old_1")
    e1.getMessage should include("recover")
    // ...and epoch 0 was NOT rewritten by the failed attempt
    spark.read.parquet(s"$dir1/batch_id=0").select("id")
      .as[Long].collect().toSeq shouldBe Seq(1L)
    // window 2: crash after the swap, before delete(old) — the epoch
    // reads redacted but .old_<k> still holds the UN-redacted rows;
    // a re-run would see no hits and must still fail loud
    val dir2 = new java.io.File(tempDir(), "epochs5.parquet").getAbsolutePath
    val sink2 = EpochParquetSink(dir2)
    sink2.writeEpoch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    new java.io.File(dir2, ".purge_0").mkdirs()
    val e2 = intercept[IllegalArgumentException] {
      sink2.purgeIds(spark, "id", Seq(99L).toDF("doc_id"))
    }
    e2.getMessage should include(".purge_0")
    // recovery (drop the leftover) restores normal operation
    new java.io.File(dir2, ".purge_0").delete() shouldBe true
    sink2.purgeIds(spark, "id", Seq(99L).toDF("doc_id")) shouldBe Seq.empty
  }

  test("OrcSink + readOrc: roundtrip preserves schema and values; filter pushes to the scan") {
    import spark.implicits._
    val dir = new java.io.File(tempDir(), "out.orc").getAbsolutePath
    val df = Seq((1L, 10.5, "a"), (2L, 20.5, "b"), (3L, 30.5, "c"))
      .toDF("k", "x", "v")
    OrcSink(dir).write(df)
    val read = Sources.readOrc(spark, Seq(dir))
    // names and types survive; nullability widens on read-back (file
    // sources report nullable), same as parquet
    read.schema.map(f => (f.name, f.dataType)) shouldBe
      df.schema.map(f => (f.name, f.dataType))
    rowSet(read) shouldBe
      Set(Seq(1L, 10.5, "a"), Seq(2L, 20.5, "b"), Seq(3L, 30.5, "c"))
    // predicate reaches the ORC scan (PushedFilters), same as parquet
    val plan = read.filter($"x" > 15.0).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    withClue(plan) {
      plan.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("GreaterThan(x,15.0)")) shouldBe true
    }
    an[IllegalArgumentException] should be thrownBy
      Sources.readOrc(spark, Seq.empty)
  }
}
