package graft

import org.apache.spark.sql.functions._

/** Scale-validation harness for the dedup family (dev aid, verdict r5
  * task #6): generates a factor-f corpus from sf0.1 documents with a
  * planted 20% duplicate-clique population, then times the five
  * pairwise/pipeline queries on it.
  *
  * Generation (`gen <f> <outDir>`): every source document yields f
  * copies. Docs with `doc_id % 5 == 0` (20%) keep their text VERBATIM
  * in every copy — a planted exact-duplicate clique of size f, the
  * web-boilerplate shape the collapse front exists for. All other
  * copies beyond the first get every word suffixed with the copy
  * index, which rewrites every shingle — fully distinct documents,
  * not accidental near-dups. Written as 32 files so the scan starts
  * parallel (the realistic multi-split layout).
  *
  * Timing (`run <sfDir> [reps]`): times each query cold (cache
  * cleared between queries) and reports per-rep seconds; scaling
  * exponents between two corpus sizes are log(tB/tA)/log(nB/nA).
  */
object DevScale {
  private val queries = Seq("q_dedup_ngram", "q_dedup_minhash",
    "q_containment", "q_dedup_clusters", "q_corpus_prepare")
  private val annQueries = Seq("q_ann_topk", "q_ann_lsh", "q_ann_ivf",
    "q_ann_pq", "q_ann_ivfpq",
    "q_embed_neardup_lsh", "q_semantic_decontaminate", "q_semantic_clusters")

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: f :: outDir :: Nil => gen(f.toInt, outDir)
    case "genEmb" :: f :: outDir :: Nil => genEmb(f.toInt, outDir)
    case "run" :: sfDir :: rest =>
      run(sfDir, queries, rest.headOption.map(_.toInt).getOrElse(3))
    case "runAnn" :: sfDir :: rest =>
      run(sfDir, annQueries, rest.headOption.map(_.toInt).getOrElse(3))
    case "bitextIvf" :: sfDir :: nCells :: rest =>
      bitextIvf(sfDir, nCells.toInt, rest.headOption.map(_.toInt).getOrElse(2))
    case "runQ" :: sfDir :: names :: rest => // arbitrary registry subset
      run(sfDir, names.split(",").toSeq.map(_.trim),
        rest.headOption.map(_.toInt).getOrElse(3))
    case "neardup" :: sfDir :: planes :: tables :: rest =>
      neardup(sfDir, planes.toInt, tables.toInt,
        rest.headOption.map(_.toInt).getOrElse(2))
    case "cross" :: sfDir :: rest =>
      cross(sfDir, rest.headOption.map(_.toInt).getOrElse(3))
    case "containAB" :: sfDir :: rest =>
      containAB(sfDir, rest.headOption.map(_.toInt).getOrElse(3))
    case "spanAB" :: sfDir :: rest =>
      spanAB(sfDir, rest.headOption.map(_.toInt).getOrElse(2))
    case "genClique" :: k :: outDir :: Nil => genClique(k.toInt, outDir)
    case "ivfAB" :: sfDir :: rest =>
      ivfAB(sfDir, rest.headOption.map(_.toInt).getOrElse(64))
    case "tripletsAB" :: sfDir :: rest =>
      tripletsAB(sfDir, rest.headOption.map(_.toInt).getOrElse(16),
        rest.lift(1).map(_.toInt).getOrElse(2))
    case "semdedupAB" :: sfDir :: rest =>
      semdedupAB(sfDir, rest.headOption.map(_.toInt).getOrElse(0))
    case "prepAB" :: sfDir :: rest =>
      prepAB(sfDir, rest.headOption.map(_.toInt).getOrElse(0))
    case "d4Scale" :: sfDir :: rest =>
      d4Scale(sfDir, rest.headOption.map(_.toInt).getOrElse(0))
    case "retrainPsi" :: sfDir :: Nil => retrainPsi(sfDir)
    case "paraLadder" :: sfDir :: rest =>
      paraLadder(sfDir, rest.headOption.map(_.toInt).getOrElse(8))
    case "prepProbe" :: sfDir :: rest =>
      prepProbe(sfDir, rest.headOption.map(_.toInt).getOrElse(0))
    case "emitAB" :: sfDir :: rest =>
      emitAB(sfDir, rest.headOption.map(_.toInt).getOrElse(2))
    case "emitEpochs" :: sfDir :: rest =>
      emitEpochs(sfDir, rest.map(_.toInt))
    case "r17AB" :: sfDir :: rest =>
      r17AB(sfDir, rest.headOption.map(_.toInt).getOrElse(2))
    case "purgeScale" :: sfDir :: rest =>
      purgeScale(sfDir, rest.headOption.map(_.toInt).getOrElse(16))
    case _ =>
      System.err.println(
        "usage: DevScale gen|genEmb <factor> <outDir> | run|runAnn <sfDir> [reps] " +
          "| cross <sfDir> [reps] | containAB <sfDir> [reps]")
      sys.exit(2)
  }

  /** Cross-set dedup ladder point (verdict r7 task #8): times
    * [[graft.ext.Dedup.minhashCrossPairs]] on `sfDir`'s documents with
    * a 100‰ hash-sample slice, on BOTH paths — the broadcast path the
    * byte-guard normally picks, and the shuffle fallback forced by a
    * 1-byte cap — so the fallback's price is a measured row in
    * SCALE.md, not a guess.
    */
  private def cross(sfDir: String, reps: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-cross")
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(cap: Long) = {
      val d = Tables(spark, sfDir, "documents")
      graft.ext.Dedup.minhashCrossPairs(d,
        graft.ext.TrainingData.hashSample(d, col("doc_id"), 100),
        "doc_id", "text", maxBroadcastBytes = cap)
    }
    val modes = Seq("broadcast" -> Long.MaxValue, "shuffle" -> 1L)
    // JIT/classload warm on the tiny corpus
    modes.foreach { case (_, cap) =>
      val w = Tables(spark, "/root/testdata/sf0.001", "documents")
      graft.ext.Dedup.minhashCrossPairs(w,
        graft.ext.TrainingData.hashSample(w, col("doc_id"), 100),
        "doc_id", "text", maxBroadcastBytes = cap).count()
    }
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      modes.foreach { case (name, cap) =>
        val t0 = System.nanoTime()
        val n = pairs(cap).count()
        println(f"[scale] $sfDir cross/$name run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** Same-window A/B for q_containment's unexplained cross-round trend
    * (verdict r7 task #3): times [[graft.ext.Dedup.containmentPairs]]
    * under collapse Never / Always / Auto in one JVM, so the split
    * between probe cost, collapse cost, and the pair join itself is
    * measured rather than inferred across rounds.
    */
  private def containAB(sfDir: String, reps: Int): Unit = {
    import graft.ext.Dedup.CollapseMode
    val spark = GraftSession.local(32, "graft-dev-scale-containab")
    spark.sparkContext.setLogLevel("ERROR")
    val modes = Seq("never" -> CollapseMode.Never,
      "always" -> CollapseMode.Always, "auto" -> CollapseMode.Auto)
    modes.foreach { case (_, m) =>
      graft.ext.Dedup.containmentPairs(
        Tables(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text", minContainment = 0.6, mode = m).count()
    }
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      modes.foreach { case (name, m) =>
        val t0 = System.nanoTime()
        val n = graft.ext.Dedup.containmentPairs(
          Tables(spark, sfDir, "documents"),
          "doc_id", "text", minContainment = 0.6, mode = m).count()
        println(f"[scale] $sfDir containment/$name run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** Factor-f embeddings corpus mirroring [[gen]]'s planted profile:
    * every sf0.1 vector yields f copies; vectors with
    * `vec_id % 5 == 0` (20%) keep their embedding VERBATIM in every
    * copy — planted cosine-1.0 near-dup cliques of size f — while
    * all other copies beyond the first add a deterministic
    * per-(vector, copy) perturbation to every component, large
    * enough (±0.5 per dim against unit-ish inputs) to move the copy
    * out of every near-dup/contamination threshold's reach.
    */
  private def genEmb(f: Int, outDir: String): Unit = {
    val spark = GraftSession.local(32, s"graft-dev-scale-genemb-$f")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    // HASH-based noise, not sin: any sin(A + i·step) family shares
    // one frequency, so every noise vector lies on a 2-D circle
    // manifold and noise·noise ≈ cos(A−B) — uniform in [−1,1], which
    // made ~10% of "distinct" copies near-dups of each other
    // (measured: 122M pairs at f30). xxhash64 per (vector, copy, dim)
    // gives independent components; amplitude 0.9/dim (RMS 0.52) →
    // |noise| ≈ 4.2 against unit inputs → copy cosine ≈ 0.23,
    // outside every threshold in the ANN family.
    val perturbed = transform(col("embedding"),
      (x, i) => x + (xxhash64(col("vec_id"), col("c"), i) % 1000L)
        .cast("double") / 1000.0 * 0.9)
    val out = e
      .select(col("*"), explode(sequence(lit(0), lit(f - 1))).as("c"))
      .select(
        (col("vec_id") * f + col("c")).as("vec_id"),
        when(col("vec_id") % 5 === 0 || col("c") === 0, col("embedding"))
          .otherwise(perturbed.cast("array<float>")).as("embedding"),
        col("label"))
    out.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val n = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"[gen] factor=$f rows=$n -> $outDir/embeddings.parquet")
    spark.stop()
  }

  /** MEGA-clique fixture: 2% of sf0.1 docs replicated k times
    * byte-identical (the 10⁴-member boilerplate-header shape), the
    * other 98% kept once — isolates the d² clique term the collapse
    * front exists for, without inflating the distinct-text corpus.
    */
  private def genClique(k: Int, outDir: String): Unit = {
    val spark = GraftSession.local(32, s"graft-dev-scale-genclique-$k")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val copies = when(col("doc_id") % 50 === 0, lit(k)).otherwise(lit(1))
    val out = docs
      .select(col("*"), explode(sequence(lit(0), copies - 1)).as("c"))
      .select((col("doc_id") * k + col("c")).as("doc_id"), col("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    out.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[gen] clique=$k rows=$n -> $outDir/documents.parquet")
    spark.stop()
  }

  private def gen(f: Int, outDir: String): Unit = {
    val spark = GraftSession.local(32, s"graft-dev-scale-gen-$f")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val out = docs
      .select(col("*"), explode(sequence(lit(0), lit(f - 1))).as("c"))
      .select(
        (col("doc_id") * f + col("c")).as("doc_id"),
        when(col("doc_id") % 5 === 0 || col("c") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              w => concat(w, lit("~"), col("c"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    out.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[gen] factor=$f rows=$n -> $outDir/documents.parquet")
    spark.stop()
  }

  /** Plane/table sizing A/B for lshNearDupPairs on a generated
    * embeddings corpus (the f30 ladder point showed the DEFAULT 6
    * planes going candidate-bound at 60k vectors).
    */
  private def neardup(sfDir: String, planes: Int, tables: Int, reps: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ext.Similarity.lshNearDupPairs(e, minCos = 0.45,
        nPlanes = planes, nTables = tables).count()
      println(f"[scale] $sfDir neardup p=$planes t=$tables run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Seed-vs-trained IVF recall A/B on a generated embeddings corpus:
    * ground truth = brute-force top-3 (cos ≥ 0.6, the meaningful-
    * neighbor rule from SimilaritySpec) for a 50-query hash sample;
    * recall and wall measured for hash-picked seeds vs 2 Lloyd
    * passes at nProbe 1 and 2.
    */
  private def ivfAB(sfDir: String, nCells: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-ivfab")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings").cache()
    val queries = e.filter(pmod(col("vec_id"), lit(97)) === 0).cache()
    val nq = queries.count()
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = key(graft.ext.Similarity.bruteForceTopK(e, queries, k = 3)
      .filter(col("cos") >= 0.6))
    Seq(1, 2).foreach { p =>
      Seq(0, 2).foreach { iters =>
        val t0 = System.nanoTime()
        val got = key(graft.ext.Similarity.ivfTopK(e, queries, k = 3,
          nCells = nCells, nProbe = p, trainIters = iters))
        val recall = (exact intersect got).size.toDouble / exact.size.max(1)
        println(f"[scale] $sfDir ivfAB cells=$nCells probe=$p iters=$iters: " +
          f"recall=$recall%.3f wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"(nq=$nq truth=${exact.size})")
      }
    }
    spark.stop()
  }

  /** Cell-sizing A/B for corpus-as-anchors triplet mining from a
    * persisted store: builds the ANN index at `nCells`, then times
    * `trainingTripletsFromIndex` over the whole corpus — the
    * ivfCellsFor(√n) story's measured face (candidates per anchor =
    * n·nProbe/nCells, so cells must grow with the corpus or the
    * serve decays to a constant-factor cut of O(n) per anchor).
    */
  private def tripletsAB(sfDir: String, nCells: Int, nProbe: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-tripletsab")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory(s"tripab$nCells").toString
    val t0 = System.nanoTime()
    graft.io.IndexStore.writeAnnIndexes(e, dir, nCells = nCells)
    val tBuild = (System.nanoTime() - t0) / 1e9
    (1 to 2).foreach { i =>
      val t1 = System.nanoTime()
      val n = graft.ext.Similarity.trainingTripletsFromIndex(
        graft.io.IndexStore.readIvfAssigned(spark, dir),
        graft.io.IndexStore.readAnnCentroids(spark, dir), e,
        nProbe = nProbe).count()
      println(f"[scale] $sfDir tripletsAB cells=$nCells probe=$nProbe run$i: " +
        f"${(System.nanoTime() - t1) / 1e9}%.2f s ($n triplets, " +
        f"build $tBuild%.2f s)")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }

  /** Dev probe for the streaming-retrain gate's drift construction:
    * for each held-out cell count k, report the fresh fraction and
    * the occupancy PSI the planner would read (fresh slice assigned
    * under a quantizer trained without cells < k, vs the post-append
    * store occupancy) — picks a k whose signal clears 0.25 at every
    * SF rather than tuning on one.
    */
  private def retrainPsi(sfDir: String): Unit = {
    import graft.ext.Similarity
    import graft.functions.IvfFunctions.ivf_cells
    val spark = GraftSession.local(32, "graft-dev-retrain-psi")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val n = e.count()
    val fullCents = Similarity.ivfCentroids(e, 16)
    val driftCell = element_at(ivf_cells(col("embedding"), fullCents, 1), 1)
    (1 to 5).foreach { k =>
      val seen = e.filter(driftCell >= k)
      val fresh = e.filter(driftCell < k)
      val nf = fresh.count()
      val dir = java.nio.file.Files.createTempDirectory(s"rpsi$k").toString
      graft.io.IndexStore.writeAnnIndexes(seen, dir)
      graft.io.IndexStore.appendAnnIndexes(fresh, dir)
      val psi = graft.io.IndexStore.annCellDrift(spark, dir, fresh)
        .agg(coalesce(sum(abs(col("psi_term"))), lit(0.0)))
        .head().getDouble(0)
      println(f"[scale] $sfDir retrainPsi heldout<$k: fresh=$nf/$n psi=$psi%.3f")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    spark.stop()
  }

  /** In-plan vs persisted-store A/B for SemDeDup: builds the ANN
    * store once (the nightly artifact), then times
    * `semDedupSurvivors` (centroid collect + nCells-dots-per-row
    * encode per run) against `semDedupFromIndex` (stored cells, one
    * broadcast-join dot per row) at the same cell count —
    * `nCells = 0` sizes with ivfCellsFor, the default both faces
    * would run at scale.
    */
  private def semdedupAB(sfDir: String, nCells0: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-semdedupab")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings")
    val nCells =
      if (nCells0 > 0) nCells0
      else graft.ext.Similarity.ivfCellsFor(e.count())
    val dir = java.nio.file.Files.createTempDirectory(s"sdab$nCells").toString
    val t0 = System.nanoTime()
    graft.io.IndexStore.writeAnnIndexes(e, dir, nCells = nCells)
    val tBuild = (System.nanoTime() - t0) / 1e9
    (1 to 2).foreach { i =>
      val t1 = System.nanoTime()
      val nIn = graft.ext.Similarity.semDedupSurvivors(e, nCells).count()
      val tIn = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val nIdx = graft.ext.Similarity.semDedupFromIndex(
        graft.io.IndexStore.readIvfAssigned(spark, dir),
        graft.io.IndexStore.readAnnCentroids(spark, dir)).count()
      val tIdx = (System.nanoTime() - t2) / 1e9
      spark.catalog.clearCache()
      println(f"[scale] $sfDir semdedupAB cells=$nCells run$i: " +
        f"inplan=$tIn%.2f s ($nIn) fromindex=$tIdx%.2f s ($nIdx, " +
        f"build $tBuild%.2f s)")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }

  /** In-plan vs store-served A/B for the e2e preparation's SEMANTIC
    * stage (verdict r14 task #1): times `CorpusPipeline.prepare`
    * three ways on the same corpus — no semantic stage (the text
    * baseline, isolating stage 4's marginal cost), the in-plan stage
    * (centroid pick + encode per run), and the store-served stage
    * (stored inverted file + quantizer, one left-semi restriction) —
    * after building the full-corpus ANN store once (the nightly
    * artifact every other serve already shares).
    */
  private def prepAB(sfDir: String, nCells0: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-prepab")
    spark.sparkContext.setLogLevel("ERROR")
    val langs = Seq("en", "de", "fr")
    def d = Tables(spark, sfDir, "documents")
    def e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val nCells =
      if (nCells0 > 0) nCells0
      else graft.ext.Similarity.ivfCellsFor(e.count())
    val dir = java.nio.file.Files.createTempDirectory(s"ppab$nCells").toString
    val t0 = System.nanoTime()
    graft.io.IndexStore.writeAnnIndexes(e, dir, nCells = nCells)
    val tBuild = (System.nanoTime() - t0) / 1e9
    import graft.ext.CorpusPipeline
    (1 to 2).foreach { i =>
      val tb = System.nanoTime()
      val nBase = CorpusPipeline.prepare(d, "doc_id", "text", langs, 0.5)
        .count()
      val tBase = (System.nanoTime() - tb) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val nIn = CorpusPipeline.prepare(d, "doc_id", "text", langs, 0.5,
        semanticVectors = Some(e), semanticTau = 0.35,
        semanticCells = nCells).count()
      val tIn = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val nIdx = CorpusPipeline.prepare(d, "doc_id", "text", langs, 0.5,
        semanticTau = 0.35,
        semanticIndex = Some((
          graft.io.IndexStore.readIvfAssigned(spark, dir),
          graft.io.IndexStore.readAnnCentroids(spark, dir)))).count()
      val tIdx = (System.nanoTime() - t2) / 1e9
      spark.catalog.clearCache()
      println(f"[scale] $sfDir prepAB cells=$nCells run$i: " +
        f"base=$tBase%.2f s ($nBase) inplan=$tIn%.2f s ($nIn) " +
        f"fromindex=$tIdx%.2f s ($nIdx, build $tBuild%.2f s)")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }

  /** Stage-piece attribution for prepAB's surprising store-face
    * timing: times the restricted semantic stage's halves in
    * isolation — text-stage survivors (reps), the restricted
    * assignment from the store, semDedupFromIndex over it, and the
    * in-plan semDedupSurvivors over the restricted vectors — so the
    * slow half is measured, not inferred from end-to-end deltas.
    */
  private def prepProbe(sfDir: String, nCells0: Int): Unit = {
    import graft.ext.{CorpusPipeline, Similarity}
    val spark = GraftSession.local(32, "graft-dev-scale-prepprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val langs = Seq("en", "de", "fr")
    val d = Tables(spark, sfDir, "documents")
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val nCells =
      if (nCells0 > 0) nCells0
      else graft.ext.Similarity.ivfCellsFor(e.count())
    val dir = java.nio.file.Files.createTempDirectory(s"pppr$nCells").toString
    graft.io.IndexStore.writeAnnIndexes(e, dir, nCells = nCells)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val reps = CorpusPipeline.prepare(d, "doc_id", "text", langs, 0.5)
        .select(col("doc_id").as("id")).cache()
      val nReps = reps.count()
      val tReps = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val repAsgn = graft.io.IndexStore.readIvfAssigned(spark, dir)
        .join(reps, Seq("id"), "left_semi").cache()
      val nAsgn = repAsgn.count()
      val tAsgn = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nIdx = Similarity.semDedupFromIndex(repAsgn,
        graft.io.IndexStore.readAnnCentroids(spark, dir), 0.35).count()
      val tIdx = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val repVecs = e.select(col("vec_id").as("id"), col("embedding"))
        .join(reps, Seq("id"), "left_semi").cache()
      repVecs.count()
      val nIn = Similarity.semDedupSurvivors(repVecs, nCells, 0.35,
        "id", "embedding").count()
      val tIn = (System.nanoTime() - t3) / 1e9
      println(f"[scale] $sfDir prepProbe cells=$nCells run$i: " +
        f"reps=$tReps%.2f s ($nReps) asgn=$tAsgn%.2f s ($nAsgn) " +
        f"fromindex=$tIdx%.2f s ($nIdx) inplan=$tIn%.2f s ($nIn)")
      spark.catalog.clearCache()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }

  /** f-ladder point for the D4 prune's one-window cost (verdict r14
    * task #4): SemDeDup survivors vs the full D4 pipeline at
    * ivfCellsFor sizing — the delta IS prototypePrune's window over
    * the √n-bounded cell partitions.
    */
  private def d4Scale(sfDir: String, nCells0: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-d4")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val nCells =
      if (nCells0 > 0) nCells0
      else graft.ext.Similarity.ivfCellsFor(e.count())
    (1 to 2).foreach { i =>
      val t1 = System.nanoTime()
      val nSem = graft.ext.Similarity.semDedupSurvivors(e, nCells).count()
      val tSem = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val nD4 = graft.ext.Similarity.d4Survivors(e, nCells).count()
      val tD4 = (System.nanoTime() - t2) / 1e9
      spark.catalog.clearCache()
      println(f"[scale] $sfDir d4Scale cells=$nCells run$i: " +
        f"semdedup=$tSem%.2f s ($nSem) d4=$tD4%.2f s ($nD4)")
    }
    spark.stop()
  }

  /** Batch ladder for the CUMULATIVE paragraph gate's ingest loop
    * (verdict r14 task #4): seeds the store from one hash slice, then
    * replays the remaining `nBatches` slices through the gate's
    * per-batch body — fresh static read of the growing hash table,
    * LEFT ANTI strip, then append — timing each half separately, so
    * the question "does per-batch cost grow with the store?" gets a
    * measured answer rather than the 3-batch gate's single point.
    * Also reports the store's accumulated row count (append never
    * dedups across batches; compactParagraphIndex reclaims) and ends
    * with one compact + a final-batch re-probe to price the reclaim.
    */
  private def paraLadder(sfDir: String, nBatches: Int): Unit = {
    import graft.ext.{Dedup, TextAnalysis}
    val spark = GraftSession.local(32, "graft-dev-scale-paraladder")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents")
    val bucket = pmod(xxhash64(col("doc_id")), lit(nBatches + 1))
    val dir = java.nio.file.Files.createTempDirectory("paraladder").toString
    val t0 = System.nanoTime()
    graft.io.IndexStore.writeParagraphIndex(d.filter(bucket === 0), dir)
    println(f"[scale] $sfDir paraLadder seed: " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    def antiCount(batch: org.apache.spark.sql.DataFrame): Long =
      Dedup.paragraphRows(batch, "doc_id", "text")
        .withColumn("h", TextAnalysis.tokenHash60(col("para")))
        .join(graft.io.IndexStore.readParagraphHashes(spark, dir),
          Seq("h"), "left_anti")
        .count()
    (1 to nBatches).foreach { k =>
      val batch = d.filter(bucket === k)
      val t1 = System.nanoTime()
      val kept = antiCount(batch)
      val tAnti = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      graft.io.IndexStore.appendParagraphIndex(batch, dir)
      val tApp = (System.nanoTime() - t2) / 1e9
      val nStore = graft.io.IndexStore.readParagraphHashes(spark, dir).count()
      println(f"[scale] $sfDir paraLadder batch$k: anti=$tAnti%.2f s " +
        f"($kept kept) append=$tApp%.2f s store=$nStore rows")
    }
    val t3 = System.nanoTime()
    graft.io.IndexStore.compactParagraphIndex(spark, dir)
    val tC = (System.nanoTime() - t3) / 1e9
    val nAfter = graft.io.IndexStore.readParagraphHashes(spark, dir).count()
    val t4 = System.nanoTime()
    val reKept = antiCount(d.filter(bucket === nBatches))
    println(f"[scale] $sfDir paraLadder compact: $tC%.2f s " +
      f"(store=$nAfter rows) reprobe=${(System.nanoTime() - t4) / 1e9}%.2f s " +
      f"($reKept kept)")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }

  /** Collapse-mode A/B for crossDocSpanPairs (the substring twin of
    * containAB): Never vs Always vs Auto on the same corpus.
    */
  private def spanAB(sfDir: String, reps: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-spanab")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents")
    import graft.ext.Dedup
    val modes = Seq("never" -> Dedup.CollapseMode.Never,
      "always" -> Dedup.CollapseMode.Always,
      "auto" -> Dedup.CollapseMode.Auto)
    (1 to reps).foreach { i =>
      modes.foreach { case (name, m) =>
        val t0 = System.nanoTime()
        val n = Dedup.crossDocSpanPairs(d, "doc_id", "text", mode = m).count()
        println(f"[scale] $sfDir spanAB $name run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** Emission-face ladder (verdict r15 task #7): emitBatches vs
    * emitChunks, global window vs shard=source, same corpus, one JVM —
    * the sharded-vs-global window funnel was plan-pinned but never
    * priced. The action sums the token-piece sizes so the payload
    * (the slices) is actually produced, not pruned under a bare count.
    */
  /** Round-17 A/Bs: (a) curriculum phases vs unphased emission (the
    * "costs nothing" claim), (b) frequency-canonical vs min-label
    * paragraph survivor, (c) the composed weighted×curriculum×chunks
    * operator vs the pairwise repeat→re-encode→chunk form.
    */
  private def r17AB(sfDir: String, reps: Int): Unit = {
    import graft.ext.{Dedup, TrainingData}
    val spark = GraftSession.local(32, "graft-dev-scale-r17ab")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents")
    val idxDir = graft.io.IndexStore.ensureBpeMerges(d, sfDir, "text",
      merges = 20)
    val merges = graft.io.IndexStore.readBpeMerges(spark, idxDir)
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)), sum(size(col("toks")))).head().getLong(0)
    val phases = Seq(when(col("source") === "src0", 1).otherwise(0))
    val weights = Map("src0" -> 3, "src2" -> 0)
    val modes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "emit/unphased" -> (() => TrainingData.emitBatches(d, "doc_id",
        "text", merges, 256, 2000, "42")),
      "emit/phased" -> (() => TrainingData.emitBatches(d, "doc_id",
        "text", merges, 256, 2000, "42", phaseCols = phases)),
      "wchunks/composed-op" -> (() => TrainingData.emitChunksRepeated(d,
        "doc_id", "text", merges, 256, 2000, "42", "source", weights,
        phaseCols = phases)),
      "wchunks/pairwise" -> (() => {
        val rep = TrainingData.repeatByWeight(
            d.select("doc_id", "text", "source"), "source", weights)
          .withColumn("ex_id", col("doc_id") * 4 + col("copy"))
        TrainingData.emitChunks(rep, "ex_id", "text", merges, 256, 2000,
          "42", phaseCols = phases)
      }))
    (1 to reps).foreach { i =>
      modes.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        val n = force(mk())
        println(f"[scale] $sfDir r17AB/$name run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
      Seq("para/min-label" -> false, "para/freq-canonical" -> true)
        .foreach { case (name, byFreq) =>
          val t0 = System.nanoTime()
          val n = Dedup.paragraphNearDupDedup(d, "doc_id", "text",
            survivorByFrequency = byFreq).count()
          println(f"[scale] $sfDir r17AB/$name run$i: " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
          spark.catalog.clearCache()
        }
    }
    spark.stop()
  }

  private def emitAB(sfDir: String, reps: Int): Unit = {
    import graft.ext.TrainingData
    val spark = GraftSession.local(32, "graft-dev-scale-emitab")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents")
    val idxDir = graft.io.IndexStore.ensureBpeMerges(d, sfDir, "text",
      merges = 20)
    val merges = graft.io.IndexStore.readBpeMerges(spark, idxDir)
    def force(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(size(col("toks")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val modes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "batches/global" -> (() => TrainingData.emitBatches(d, "doc_id",
        "text", merges, 256, 2000, "42")),
      "batches/sharded" -> (() => TrainingData.emitBatches(d, "doc_id",
        "text", merges, 256, 2000, "42", Some("source"))),
      "chunks/global" -> (() => TrainingData.emitChunks(d, "doc_id",
        "text", merges, 256, 2000, "42")),
      "chunks/sharded" -> (() => TrainingData.emitChunks(d, "doc_id",
        "text", merges, 256, 2000, "42", Some("source"))))
    // JIT/classload warm on the tiny corpus (same merges — only the
    // encode path needs warming)
    val w = Tables(spark, "/root/testdata/sf0.001", "documents")
    force(TrainingData.emitChunks(w, "doc_id", "text", merges, 256, 2000,
      "42"))
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      modes.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        val (n, tok) = force(mk())
        println(f"[scale] $sfDir emitAB/$name run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows, $tok toks)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }

  /** EpochParquetSink.purgeIds cost ladder (verdict r17 task #6): the
    * k-of-n claim — a takedown touching k of n epochs pays n detect
    * scans + k rewrites — measured at three touch patterns on one
    * sink (no-hit k=0, single-epoch k=1, spread k=n). Epoch = doc_id
    * mod n, so the delete predicate controls k exactly.
    */
  private def purgeScale(sfDir: String, nEpochs: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-purge")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val stage = java.nio.file.Files.createTempDirectory("graft-purge")
    try {
      def buildSink(tag: String): graft.io.EpochParquetSink = {
        val sink = graft.io.EpochParquetSink(
          stage.resolve(s"sink$tag").toString)
        val t0 = System.nanoTime()
        sink.write(d.withColumn("batch_id",
          pmod(col("doc_id"), lit(nEpochs.toLong))))
        println(f"[scale] $sfDir purge build n=$nEpochs: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        sink
      }
      def timePurge(sink: graft.io.EpochParquetSink, label: String,
          ids: org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val k = sink.purgeIds(spark, "doc_id", ids).size
        println(f"[scale] $sfDir purge n=$nEpochs $label: k=$k " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val s0 = buildSink("0")
      timePurge(s0, "detect-only",
        d.select((col("doc_id") * -1 - 1).as("doc_id")).limit(100))
      timePurge(s0, "k=1",
        d.select("doc_id")
          .filter(col("doc_id") % nEpochs === 0 && col("doc_id") % 17 === 3))
      // fresh sink: the spread purge must not ride the k=1 rewrite
      val s1 = buildSink("1")
      timePurge(s1, "spread",
        d.select("doc_id").filter(col("doc_id") % 17 === 3))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
      spark.stop()
    }
  }

  /** Per-epoch cost ladder for the streaming emission loop (verdict
    * r15 task #3's done-criterion): the same corpus split into n
    * micro-batch slices for growing n — with the O(1) sink-offset
    * derivation the per-epoch cost must stay FLAT in epoch count
    * (the old whole-sink scan made the loop O(epochs²) in sink reads).
    */
  private def emitEpochs(sfDir: String, slices: Seq[Int]): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-emitepochs")
    spark.sparkContext.setLogLevel("ERROR")
    val ns = if (slices.isEmpty) Seq(3, 9, 27) else slices
    graft.streaming.StreamingGate
      .streamEmitBatchesFromFiles(spark, "/root/testdata/sf0.001").count()
    ns.foreach { n =>
      val t0 = System.nanoTime()
      val rows = graft.streaming.StreamingGate
        .streamEmitBatchesFromFiles(spark, sfDir, n).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $sfDir emitEpochs n=$n: $t%.2f s total, " +
        f"${t / n}%.3f s/epoch ($rows rows)")
    }
    spark.stop()
  }

  /** Occupancy-scaled bitext-mining probe: the registry face serves
    * from the shared 16-cell store (the oracle-replayable contract),
    * which keeps candidate volume quadratic at nProbe/nCells — this
    * measures [[graft.ext.Similarity.mineBitextFromIndex]] with
    * `nCells = ivfCellsFor(n)` (the √n rule), the sizing a production
    * corpus×corpus mine would deploy, against the same corpus.
    */
  private def bitextIvf(sfDir: String, nCellsArg: Int, reps: Int): Unit = {
    import graft.ext.Similarity
    import graft.functions.IvfFunctions.ivf_cells
    val spark = GraftSession.local(32, "graft-dev-scale-bitext")
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val nCells =
      if (nCellsArg > 0) nCellsArg else Similarity.ivfCellsFor(n)
    val cents = Similarity.ivfCentroids(e, nCells)
    val assigned = Similarity.withNorm(
        e.select(col("vec_id").as("id"), col("embedding").as("vec")))
      .withColumn("cell", element_at(ivf_cells(col("vec"), cents, 1), 1))
      .localCheckpoint() // the store read a persisted serve would do
    val aSrc = assigned.filter(col("id") % 2 === 0)
    val aTgt = assigned.filter(col("id") % 2 === 1)
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 === 1)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val rows = Similarity.mineBitextFromIndex(aSrc, aTgt, cents,
        src, tgt).count()
      println(f"[scale] $sfDir bitextIvf n=$n nCells=$nCells run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  private def run(sfDir: String, qs: Seq[String], reps: Int): Unit = {
    val spark = GraftSession.local(32, "graft-dev-scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/classload warm-up on the tiny corpus, then measure cold
    qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    (1 to reps).foreach { i =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"[scale] $sfDir $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
