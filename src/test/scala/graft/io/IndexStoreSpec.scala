package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.Tables(spark, sfDir, "documents")
  private def bucket = graft.ext.TrainingData.splitBucket(col("doc_id"), 1000)
  private def seen = docs.filter(bucket < 500)
  private def slice = docs.filter(bucket >= 500 && bucket < 600)
    .select("doc_id", "text")

  test("write→read round trip: every table matches its in-plan build") {
    val dir = java.nio.file.Files.createTempDirectory("idxstore").toString
    IndexStore.writeAdmissionIndexes(seen, dir)

    // digests
    val wantDigests = seen.select(md5(col("text")).as("digest")).distinct()
    IndexStore.readDigests(spark, dir).collect().map(_.getString(0)).sorted shouldBe
      wantDigests.collect().map(_.getString(0)).sorted

    // span hashes
    val wantSpans = graft.ext.Dedup.spanHashIndex(seen, "doc_id", "text", 8)
      .select("h").distinct()
    IndexStore.readSpanHashes(spark, dir).collect().map(_.getLong(0)).sorted shouldBe
      wantSpans.collect().map(_.getLong(0)).sorted

    // band index: same rows as banding the corpus in-plan
    val sets = seen.select(col("doc_id").as("id"),
      graft.functions.TextHashFunctions.shingle_hashes(
        col("text"), graft.ext.HashDefs.ShingleN).as("hs"))
    val wantBands = graft.ext.Dedup.lshBands(graft.ext.Dedup.minhashSignature(sets))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    IndexStore.readBandIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sorted shouldBe wantBands

    // NB weights: the persisted map equals the trained map
    IndexStore.readNbWeightsMicro(spark, dir) shouldBe
      graft.ext.QualityModel.nbWeightsMicro(seen, "doc_id", "text")

    // manifest exists and records the build parameters
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifest.json")), "UTF-8")
    manifest should include(""""kind": "admission"""")
    manifest should include(""""shingle_n": 3""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("admitFromIndexes equals the in-plan ladder + quality gate") {
    val dir = java.nio.file.Files.createTempDirectory("idxadmit").toString
    IndexStore.writeAdmissionIndexes(seen, dir)
    val got = IndexStore.admitFromIndexes(slice, spark, dir)
      .collect().map(_.getLong(0)).sorted

    // in-plan replay of the same four rungs
    val seenDigests = seen.select(md5(col("text")).as("digest")).distinct()
    val exactNovel = slice.withColumn("digest", md5(col("text")))
      .join(seenDigests, Seq("digest"), "left_anti").drop("digest")
    val corpusSpans = graft.ext.Dedup.spanHashIndex(seen, "doc_id", "text", 8)
      .select("h").distinct()
    val substrHits = graft.ext.Dedup.spanHashIndex(slice, "doc_id", "text", 8)
      .join(corpusSpans, Seq("h"), "left_semi")
      .select(col("id").as("doc_id")).distinct()
    val fuzzyHits = graft.ext.Dedup.minhashCrossPairs(seen, slice, "doc_id", "text")
      .select(col("new_id").as("doc_id")).distinct()
    val weights = graft.ext.QualityModel.nbWeightsMicro(seen, "doc_id", "text")
    val want = graft.ext.QualityModel.admitByModel(
        exactNovel
          .join(substrHits, Seq("doc_id"), "left_anti")
          .join(fuzzyHits, Seq("doc_id"), "left_anti"),
        weights)
      .select("doc_id").collect().map(_.getLong(0)).sorted

    got shouldBe want
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("ANN write→read round trip: served results equal in-plan builds") {
    val dir = java.nio.file.Files.createTempDirectory("idxann").toString
    val e = graft.Tables(spark, sfDir, "embeddings")
    IndexStore.writeAnnIndexes(e, dir)

    // quantizer + codebooks survive the parquet round trip bit-for-bit
    IndexStore.readAnnCentroids(spark, dir).map(_.toSeq).toSeq shouldBe
      graft.ext.Similarity.ivfCentroids(e, 16).map(_.toSeq).toSeq
    IndexStore.readAnnCodebooks(spark, dir).map(_.map(_.toSeq).toSeq).toSeq shouldBe
      graft.ext.Similarity.pqCodebooks(e, 4, 16, 64).map(_.map(_.toSeq).toSeq).toSeq

    val q = e.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    rows(graft.ext.Similarity.ivfTopKFromIndex(
      IndexStore.readIvfAssigned(spark, dir),
      IndexStore.readAnnCentroids(spark, dir), q, k = 5)) shouldBe
      rows(graft.ext.Similarity.ivfTopK(e, q, k = 5))
    rows(graft.ext.Similarity.ivfPqTopKFromIndex(
      IndexStore.readAnnCodes(spark, dir),
      IndexStore.readAnnCentroids(spark, dir),
      IndexStore.readAnnCodebooks(spark, dir), q, k = 5)) shouldBe
      rows(graft.ext.Similarity.ivfPqTopK(e, q, k = 5))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("appendAdmissionIndexes: append-then-serve equals rebuild over the union") {
    val dirA = java.nio.file.Files.createTempDirectory("idxappend").toString
    val dirB = java.nio.file.Files.createTempDirectory("idxrebuild").toString
    val slice1 = docs.filter(bucket >= 500 && bucket < 550).select("doc_id", "text")
    val slice2 = docs.filter(bucket >= 550 && bucket < 600).select("doc_id", "text")

    IndexStore.writeAdmissionIndexes(seen, dirA)
    IndexStore.appendAdmissionIndexes(slice1, dirA)
    IndexStore.writeAdmissionIndexes(seen.select("doc_id", "text")
      .unionByName(slice1), dirB)

    // set equality per table (digests/spans may duplicate ROWS across
    // append batches — set semantics for their semi/anti consumers)
    IndexStore.readDigests(spark, dirA).distinct().collect()
      .map(_.getString(0)).sorted shouldBe
      IndexStore.readDigests(spark, dirB).distinct().collect()
        .map(_.getString(0)).sorted
    IndexStore.readSpanHashes(spark, dirA).distinct().collect()
      .map(_.getLong(0)).sorted shouldBe
      IndexStore.readSpanHashes(spark, dirB).distinct().collect()
        .map(_.getLong(0)).sorted
    IndexStore.readBandIndex(spark, dirA).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted shouldBe
      IndexStore.readBandIndex(spark, dirB).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted

    // the three dedup rungs gate slice2 identically under both stores
    // (the model rung is deliberately NOT appendable — llr depends on
    // global totals; retrain on corpus refresh)
    def dedupAdmit(dir: String): Array[Long] = {
      val exactNovel = slice2.withColumn("digest", md5(col("text")))
        .join(IndexStore.readDigests(spark, dir), Seq("digest"), "left_anti")
        .drop("digest")
      val substrHits = graft.ext.Dedup.spanHashIndex(slice2, "doc_id", "text", 8)
        .join(IndexStore.readSpanHashes(spark, dir), Seq("h"), "left_semi")
        .select(col("id").as("doc_id")).distinct()
      val fuzzyHits = graft.ext.Dedup.minhashCrossPairsFromIndex(
          IndexStore.readBandIndex(spark, dir),
          IndexStore.readShingleSets(spark, dir),
          slice2, "doc_id", "text")
        .select(col("new_id").as("doc_id")).distinct()
      exactNovel.join(substrHits, Seq("doc_id"), "left_anti")
        .join(fuzzyHits, Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).sorted
    }
    val admitted = dedupAdmit(dirA)
    admitted shouldBe dedupAdmit(dirB)
    admitted.length should be > 0

    for (d <- Seq(dirA, dirB))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }

  test("ensureAdmissionIndexes builds once per corpus dir and memoizes") {
    IndexStore.resetBuilt()
    val d1 = IndexStore.ensureAdmissionIndexes(seen, sfDir)
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(d1, "manifest.json")) shouldBe true
    // second call: same dir, no rebuild (manifest mtime unchanged)
    val t1 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d1, "manifest.json"))
    val d2 = IndexStore.ensureAdmissionIndexes(seen, sfDir)
    d2 shouldBe d1
    java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d1, "manifest.json")) shouldBe t1
  }
}
