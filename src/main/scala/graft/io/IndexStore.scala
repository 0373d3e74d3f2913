package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted index artifacts — the build-once/serve-many faces of the
  * admission ladder. Every rung of the streaming/batch ingest gate
  * joins a *fresh slice* against a *batch-built corpus index*; until
  * now those indexes were rebuilt inside every query plan. At 100 TB
  * they are nightly build artifacts: computed once by an offline job,
  * written as parquet tables + a manifest, and served to every
  * admission query and streaming gate until the next corpus refresh.
  *
  * Layout under `dir` (all plain parquet — any engine can audit them):
  * {{{
  *   manifest.json                       build parameters + row counts
  *   digests/       (digest string)      exact rung (md5 of text)
  *   span_hashes/   (h long)             substring rung (distinct
  *                                       8-word span hashes)
  *   shingle_sets/  (id, hs array<long>) fuzzy rung verify side
  *   band_index/    (id, band, band_hash) fuzzy rung candidate side
  *   nb_weights/    (term, llr_micro)    model rung (micro-unit NB llr)
  * }}}
  *
  * Scale notes: each table is exactly the shuffle currency its rung
  * already used (16-byte digests, 8-byte span hashes, banded minhash
  * rows — never document text), so serving cost equals the in-plan
  * join cost minus the whole corpus-side build. The digest/span tables
  * are written pre-distinct'd so gate-side semi-joins need no
  * re-aggregation. Writes go through the Hadoop FS API, so `dir` can
  * be any supported scheme (local, HDFS, cloud object store).
  */
object IndexStore {

  val DigestsTable = "digests"
  val SpanHashesTable = "span_hashes"
  val ShingleSetsTable = "shingle_sets"
  val BandIndexTable = "band_index"
  val NbWeightsTable = "nb_weights"

  /** Build every admission-ladder index from `corpus` and persist it
    * under `dir`. One corpus pass per rung (each is the rung's
    * existing one-scan build), each written as parquet.
    */
  def writeAdmissionIndexes(corpus: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text",
      spanWords: Int = 8): Unit = {
    import graft.ext.{Dedup, QualityModel}
    val spark = corpus.sparkSession

    corpus.select(md5(col(textCol)).as("digest")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$DigestsTable")

    Dedup.spanHashIndex(corpus, idCol, textCol, spanWords)
      .select("h").distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$SpanHashesTable")

    val sets = corpus.select(col(idCol).as("id"),
      graft.functions.TextHashFunctions.shingle_hashes(
        col(textCol), graft.ext.HashDefs.ShingleN).as("hs"))
    sets.write.mode(SaveMode.Overwrite).parquet(s"$dir/$ShingleSetsTable")
    // bands derive from the PERSISTED sets, so the two fuzzy tables
    // can never drift apart across a partial rebuild
    Dedup.lshBands(Dedup.minhashSignature(
        spark.read.parquet(s"$dir/$ShingleSetsTable")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$BandIndexTable")

    QualityModel.nbTermWeightsMicro(corpus, idCol, textCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$NbWeightsTable")

    writeManifest(spark, dir, Seq(
      "kind" -> "\"admission\"",
      "id_col" -> s""""$idCol"""",
      "text_col" -> s""""$textCol"""",
      "span_words" -> spanWords.toString,
      "shingle_n" -> graft.ext.HashDefs.ShingleN.toString,
      "minhash_k" -> graft.ext.HashDefs.K.toString,
      "bands" -> graft.ext.HashDefs.Bands.toString,
      "rows_per_band" -> graft.ext.HashDefs.RowsPerBand.toString,
      "tables" -> Seq(DigestsTable, SpanHashesTable, ShingleSetsTable,
        BandIndexTable, NbWeightsTable)
        .map("\"" + _ + "\"").mkString("[", ",", "]")))
  }

  def readDigests(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$DigestsTable")
  def readSpanHashes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$SpanHashesTable")
  def readShingleSets(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$ShingleSetsTable")
  def readBandIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$BandIndexTable")

  /** The model rung's ship-to-executors artifact, loaded from the
    * persisted weight table (same fail-loud cap discipline as
    * [[graft.ext.QualityModel.nbWeightsMicro]]).
    */
  def readNbWeightsMicro(spark: SparkSession, dir: String,
      maxVocab: Int = 1 << 20): Map[String, Long] = {
    val rows = spark.read.parquet(s"$dir/$NbWeightsTable")
    val n = rows.count()
    require(n <= maxVocab,
      s"readNbWeightsMicro: persisted vocabulary has $n terms > " +
        s"maxVocab=$maxVocab — prune the tail or use a broadcast-join scorer")
    rows.select("term", "llr_micro").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Full four-rung admission of `fresh` against the PERSISTED
    * indexes: exact (digest anti-join) ∖ substring (span semi-join) ∖
    * fuzzy (band-index candidates + stored-set Jaccard verify), then
    * the model rung's row-local micro-llr filter. Admits exactly what
    * the in-plan ladder + quality gate admit (oracle-pinned by
    * q_admit_persisted) while never touching the corpus — the serve
    * path a nightly-built 100 TB index feeds.
    */
  def admitFromIndexes(fresh: DataFrame, spark: SparkSession, dir: String,
      idCol: String = "doc_id", textCol: String = "text",
      spanWords: Int = 8, minJaccard: Double = 0.5): DataFrame = {
    import graft.ext.{Dedup, QualityModel}
    val exactNovel = fresh.withColumn("digest", md5(col(textCol)))
      .join(readDigests(spark, dir), Seq("digest"), "left_anti")
      .drop("digest")
    val substrHits = Dedup.spanHashIndex(fresh, idCol, textCol, spanWords)
      .join(readSpanHashes(spark, dir), Seq("h"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    val fuzzyHits = Dedup.minhashCrossPairsFromIndex(
        readBandIndex(spark, dir), readShingleSets(spark, dir),
        fresh, idCol, textCol, minJaccard)
      .select(col("new_id").as(idCol)).distinct()
    val weights = readNbWeightsMicro(spark, dir)
    QualityModel.admitByModel(
        exactNovel
          .join(substrHits, Seq(idCol), "left_anti")
          .join(fuzzyHits, Seq(idCol), "left_anti"),
        weights, textCol)
      .select(idCol)
  }

  /** Incremental maintenance — the production ingest loop's other
    * half: after a slice is ADMITTED, append its index rows so the
    * next slice is gated against corpus ∪ admitted without a rebuild.
    * The three dedup indexes are pure unions, so appending the new
    * docs' rows (parquet append — one new file set, no rewrite) makes
    * the store EXACTLY equal to a from-scratch build over the grown
    * corpus, with two caveats by design: `digests` and `span_hashes`
    * are written pre-distinct'd per batch, so cross-batch duplicates
    * can appear as extra ROWS — harmless for the semi/anti-join
    * consumers (set semantics) and reclaimed by the next full
    * rebuild/compaction; and the NB weight table is NOT appendable
    * (llr depends on global totals) — retrain it on the next corpus
    * refresh, like every shipped model artifact. Equality of
    * append-then-serve vs rebuild-over-union is pinned in
    * IndexStoreSpec.
    */
  def appendAdmissionIndexes(newDocs: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text",
      spanWords: Int = 8): Unit = {
    import graft.ext.Dedup
    newDocs.select(md5(col(textCol)).as("digest")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$dir/$DigestsTable")
    Dedup.spanHashIndex(newDocs, idCol, textCol, spanWords)
      .select("h").distinct()
      .write.mode(SaveMode.Append).parquet(s"$dir/$SpanHashesTable")
    val sets = newDocs.select(col(idCol).as("id"),
      graft.functions.TextHashFunctions.shingle_hashes(
        col(textCol), graft.ext.HashDefs.ShingleN).as("hs"))
    sets.write.mode(SaveMode.Append).parquet(s"$dir/$ShingleSetsTable")
    Dedup.lshBands(Dedup.minhashSignature(sets))
      .write.mode(SaveMode.Append).parquet(s"$dir/$BandIndexTable")
  }

  /** Session-scoped build-once memo: the first call for a (session,
    * corpus-dir) pair builds + writes the admission indexes under
    * target/indexes/<key>; later calls (bench reps, other registry
    * queries, streaming gates) reuse the files — the measured
    * "rebuild avoided" datapoint in SCALE.md §indexes. Keyed by the
    * destination path, which encodes the corpus dir.
    */
  private val built = java.util.concurrent.ConcurrentHashMap
    .newKeySet[String]()

  def ensureAdmissionIndexes(corpus: DataFrame, corpusDir: String,
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val key = corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val dir = java.nio.file.Paths.get("target", "indexes", key)
      .toAbsolutePath.toString
    if (!built.contains(dir)) built.synchronized {
      if (!built.contains(dir)) {
        writeAdmissionIndexes(corpus, dir, idCol, textCol)
        built.add(dir)
        ()
      }
    }
    dir
  }

  /** Test hook: forget the build memo (forces a rebuild). */
  private[graft] def resetBuilt(): Unit = built.clear()

  // ---- ANN index family (IVF inverted file + PQ codebooks/codes) ----

  val AnnCentroidsTable = "ann_centroids"
  val AnnCodebooksTable = "ann_codebooks"
  val AnnCodesTable = "ann_codes"
  val IvfAssignedTable = "ivf_assigned"

  /** Build and persist the ANN index family from `corpus`:
    * {{{
    *   ann_centroids/ (cell, vec)        the IVF coarse quantizer
    *   ann_codebooks/ (s, j, vec)        PQ sub-space codebooks
    *   ann_codes/     (id, cell, codes)  m bytes + a cell per vector
    *   ivf_assigned/  (id, cell, vec, norm)  the full-precision
    *                                     inverted file (exact-cosine
    *                                     IVF serving and PQ rerank)
    * }}}
    * The quantizer tables are tiny (nCells + m·ks rows); `ann_codes`
    * is the 16×-compressed scan body; `ivf_assigned` is corpus-sized
    * — the standard IndexIVFPQ storage split. At 100 TB one would
    * additionally partition `ivf_assigned` BY cell so a probe prunes
    * files, the same layout discipline as
    * [[graft.ops.Layout]]'s Z-order cells.
    */
  def writeAnnIndexes(corpus: DataFrame, dir: String, nCells: Int = 16,
      m: Int = 4, ks: Int = 16, dim: Int = 64, trainIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import graft.ext.Similarity
    import graft.functions.IvfFunctions.ivf_cells
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      if (trainIters > 0)
        Similarity.ivfCentroidsTrained(corpus, nCells, idCol, vecCol, trainIters)
      else Similarity.ivfCentroids(corpus, nCells, idCol, vecCol)
    val cb = Similarity.pqCodebooks(corpus, m, ks, dim, idCol, vecCol)

    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cell", "vec")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$AnnCentroidsTable")
    cb.zipWithIndex.flatMap { case (sub, s) =>
        sub.zipWithIndex.map { case (v, j) => (s, j, v.toSeq) }
      }.toSeq.toDF("s", "j", "vec")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$AnnCodebooksTable")

    // codes are cell-partitioned like the inverted file: the IVF-PQ
    // serve's cell equi-join prunes code files the same way (DPP)
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("rv"),
        Similarity.normalizedGuarded(col(vecCol)).as("nv"))
      .select(col("id"),
        element_at(ivf_cells(col("rv"), cents, 1), 1).as("cell"),
        Similarity.pqEncode(col("nv"), cb).as("codes"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/$AnnCodesTable")

    // the inverted file is PARTITIONED BY cell — the layout that makes
    // "inverted" physical: a probe's cell equi-join prunes whole files
    // (statically for literal cells, via dynamic partition pruning for
    // the broadcast probe side), so an nProbe/nCells query reads
    // nProbe/nCells of the bytes, not just of the rows
    Similarity.withNorm(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .withColumn("cell", element_at(ivf_cells(col("vec"), cents, 1), 1))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/$IvfAssignedTable")

    writeManifest(spark, dir, Seq(
      "kind" -> "\"ann\"",
      "id_col" -> s""""$idCol"""",
      "vec_col" -> s""""$vecCol"""",
      "n_cells" -> nCells.toString,
      "m" -> m.toString,
      "ks" -> ks.toString,
      "dim" -> dim.toString,
      "train_iters" -> trainIters.toString,
      "tables" -> Seq(AnnCentroidsTable, AnnCodebooksTable, AnnCodesTable,
        IvfAssignedTable).map("\"" + _ + "\"").mkString("[", ",", "]")))
  }

  /** The coarse quantizer, cell-ordered. */
  def readAnnCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/$AnnCentroidsTable")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** PQ codebooks as codebooks(s)(j). */
  def readAnnCodebooks(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$dir/$AnnCodebooksTable")
      .orderBy("s", "j").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2)).toArray
  }

  def readAnnCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$AnnCodesTable")
  def readIvfAssigned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$IvfAssignedTable")

  /** Session-scoped build-once memo for the ANN indexes (same
    * discipline as [[ensureAdmissionIndexes]]).
    */
  def ensureAnnIndexes(corpus: DataFrame, corpusDir: String): String = {
    val key = corpusDir.replaceAll("[^A-Za-z0-9._-]", "_") + "-ann"
    val dir = java.nio.file.Paths.get("target", "indexes", key)
      .toAbsolutePath.toString
    if (!built.contains(dir)) built.synchronized {
      if (!built.contains(dir)) {
        writeAnnIndexes(corpus, dir)
        built.add(dir)
        ()
      }
    }
    dir
  }

  /** Tiny dependency-free JSON manifest via the Hadoop FS API (works
    * on any scheme `dir` itself works on). Values arrive pre-encoded.
    */
  private def writeManifest(spark: SparkSession, dir: String,
      fields: Seq[(String, String)]): Unit = {
    val json = fields.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n  ", ",\n  ", "\n}\n")
    val path = new org.apache.hadoop.fs.Path(s"$dir/manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
