package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.SkewJoin

/** Dataset-assembly operators: stable splits, truncation, packing,
  * sampling, salted joins.
  */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("splitBucket: stable, in range, repartition-invariant") {
    val df = (1L to 200L).toDF("id")
    val a = df.select(col("id"), TrainingData.splitBucket(col("id")).as("b"))
    val b = df.repartition(7).select(col("id"), TrainingData.splitBucket(col("id")).as("b"))
    rowSet(a) shouldBe rowSet(b) // layout-independent
    a.filter(col("b") < 0 || col("b") >= 100).count() shouldBe 0L
  }

  test("withSplit: buckets partition into train/valid/test consistently") {
    val df = (1L to 500L).toDF("id")
    val out = TrainingData.withSplit(df, col("id"))
    out.filter(col("split") === "train" && col("split_bucket") >= 80).count() shouldBe 0L
    out.filter(col("split") === "valid" &&
      (col("split_bucket") < 80 || col("split_bucket") >= 90)).count() shouldBe 0L
    out.filter(col("split") === "test" && col("split_bucket") < 90).count() shouldBe 0L
    // roughly 80/10/10 over 500 uniform hashes
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts("train").toDouble should be > 300.0
    counts("train").toDouble should be < 480.0
  }

  test("truncateTokens: caps token count, short docs untouched") {
    val df = Seq("a b c d e", "x y").toDF("text")
      .select(TrainingData.truncateTokens(col("text"), 3).as("t"))
    rowSet(df) shouldBe Set(Seq("a b c"), Seq("x y"))
  }

  test("packIntoBins: bins advance with the running token count") {
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens, before=0  → bin 0
      (2L, "d e f g"),      // 4 tokens, before=3  → bin 0
      (3L, "h i"),          // 2 tokens, before=7  → bin 1
      (4L, "j k l m n o")   // 6 tokens, before=9  → bin 1
    ).toDF("doc_id", "text")
    val out = TrainingData.packIntoBins(docs, "text", "doc_id", budget = 5)
      .select("doc_id", "tokens_before", "bin")
    rowSet(out) shouldBe Set(
      Seq(1L, 0L, 0), Seq(2L, 3L, 0), Seq(3L, 7L, 1), Seq(4L, 9L, 1))
  }

  test("packIntoBins: sharded packing restarts per shard") {
    val docs = Seq(
      ("s1", 1L, "a b c"), ("s1", 2L, "d e f"),
      ("s2", 3L, "g h i")).toDF("shard", "doc_id", "text")
    val out = TrainingData.packIntoBins(docs, "text", "doc_id",
      budget = 4, shard = Some("shard"))
      .select("doc_id", "tokens_before", "bin")
    rowSet(out) shouldBe Set(
      Seq(1L, 0L, 0), Seq(2L, 3L, 0), Seq(3L, 0L, 0))
  }

  test("chunkTokens: overlap windows, short doc = one chunk, boundary exact") {
    // 10 tokens, size 4, overlap 2 → stride 2 → ceil((10-2)/2) = 4 chunks
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "short doc")).toDF("doc_id", "text")
    val out = TrainingData.chunkTokens(docs, "doc_id", "text",
        chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    out((1L, 0)) shouldBe ("t0 t1 t2 t3", 4)
    out((1L, 1)) shouldBe ("t2 t3 t4 t5", 4) // overlap of 2 with chunk 0
    out((1L, 3)) shouldBe ("t6 t7 t8 t9", 4) // last chunk exactly flush
    out.keys.count(_._1 == 1L) shouldBe 4
    // doc shorter than one chunk: exactly one (whole-doc) chunk
    out((2L, 0)) shouldBe ("short doc", 2)
    out.keys.count(_._1 == 2L) shouldBe 1
    // every token index is covered by some chunk (no gaps at stride
    // boundaries) — the property that matters for pretraining windows
    val covered = out.collect { case ((1L, i), _) =>
      (i * 2) until math.min(i * 2 + 4, 10) }.flatten.toSet
    covered shouldBe (0 until 10).toSet
  }

  test("weightedHashSample: weight 1 keeps all, 0 drops all, monotone in weight") {
    val df = (1L to 400L).map(i => (i, i % 4)).toDF("id", "w4")
    TrainingData.weightedHashSample(df, col("id"), lit(1.0)).count() shouldBe 400L
    TrainingData.weightedHashSample(df, col("id"), lit(0.0)).count() shouldBe 0L
    // per-row weight w4/4 ∈ {0, .25, .5, .75}: rows with weight 0 all
    // gone; each kept row must also survive at any HIGHER weight
    val kept = TrainingData.weightedHashSample(df, col("id"),
      col("w4").cast("double") / 4.0)
    kept.filter(col("w4") === 0).count() shouldBe 0L
    val atHalf = TrainingData.weightedHashSample(df, col("id"), lit(0.5))
      .collect().map(_.getLong(0)).toSet
    kept.filter(col("w4") === 2).collect().map(_.getLong(0))
      .forall(atHalf.contains) shouldBe true
    // layout-independent
    rowSet(TrainingData.weightedHashSample(df.repartition(7), col("id"),
      col("w4").cast("double") / 4.0)) shouldBe rowSet(kept)
  }

  test("hashSample: subset, layout-stable, ~permille fraction") {
    val df = (1L to 1000L).toDF("id")
    val s = TrainingData.hashSample(df, col("id"), permille = 200)
    val n = s.count()
    n.toDouble should be > 120.0
    n.toDouble should be < 280.0
    // stable across repartition
    TrainingData.hashSample(df.repartition(13), col("id"), 200)
      .count() shouldBe n
  }

  test("stratifiedHashSample: per-stratum rates, nested in the flat sample") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "src")
    val strat = TrainingData.stratifiedHashSample(df, col("id"), "src",
      Map("a" -> 100, "b" -> 400))
    // every stratum's survivors are a subset of the flat sample at its rate
    val flat400 = rowSet(TrainingData.hashSample(df, col("id"), 400))
    rowSet(strat) subsetOf flat400 shouldBe true
    // stratum a at 100 permille ⊂ stratum a at 400 permille (nested growth)
    rowSet(strat.filter(col("src") === "a")) subsetOf
      rowSet(TrainingData.hashSample(df.filter(col("src") === "a"), col("id"), 400)) shouldBe true
    // unknown strata keep the default (1000 = everything)
    TrainingData.stratifiedHashSample(df, col("id"), "src", Map("zzz" -> 0))
      .count() shouldBe 300L
  }

  test("fixedNPerStratum: exact size per stratum, layout-stable, nested") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "src")
    val s = TrainingData.fixedNPerStratum(df, col("id"), "src", n = 20)
    s.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("a" -> 20L, "b" -> 20L)
    // stratum smaller than n → whole stratum survives
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "src")
    TrainingData.fixedNPerStratum(tiny, col("id"), "src", n = 10)
      .count() shouldBe 3L
    // layout-independent: same survivors after repartition
    rowSet(TrainingData.fixedNPerStratum(df.repartition(11), col("id"), "src", 20)) shouldBe
      rowSet(s)
    // nested growth: top-20 ⊂ top-50 per stratum (hash order is a total order)
    rowSet(s) subsetOf
      rowSet(TrainingData.fixedNPerStratum(df, col("id"), "src", 50)) shouldBe true
  }

  test("temperatureMix: smallest stratum whole, rates follow sqrt(n_min/n_s)") {
    // strata sizes 400 / 100 / 25 → n_min 25 → rates 250‰ / 500‰ / 1000‰
    val df = ((1L to 400L).map((_, "a")) ++ (401L to 500L).map((_, "b")) ++
      (501L to 525L).map((_, "c"))).toDF("id", "src")
    val out = TrainingData.temperatureMix(df, col("id"), "src")
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("c") shouldBe 25L // smallest stratum fully kept
    // expected ≈ n_s · rate/1000 = 100 / 50 / 25: generous hash bands
    kept("a").toDouble should be (100.0 +- 40.0)
    kept("b").toDouble should be (50.0 +- 25.0)
    // survivors ≡ the stratified hash sample at the derived rates —
    // pins the rate formula (400: 1e6·25/400 = 62500 → √ = 250)
    rowSet(out) shouldBe rowSet(TrainingData.stratifiedHashSample(
      df, col("id"), "src", Map("a" -> 250, "b" -> 500, "c" -> 1000)))
    // layout-independent
    rowSet(TrainingData.temperatureMix(df.repartition(9), col("id"), "src")) shouldBe
      rowSet(out)
  }

  test("capTokensPerStratum: cuts at the budget in hash order, straddler kept") {
    val df = Seq(
      (1L, "s", "a b c"), (2L, "s", "d e f"), (3L, "s", "g h"),
      (4L, "t", "x y z w v u")).toDF("id", "src", "text")
    // hash order within s drives who is "before" the cut; compute it
    val order = df.filter(col("src") === "s")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .collect().map(_.getLong(0))
    // budget 4: first doc (≤3 tokens, before=0) kept; second doc
    // before=3 < 4 kept (straddler); third before≥5 dropped
    val out = TrainingData.capTokensPerStratum(df, col("id"), "src", "text", 4L)
    val keptS = out.filter(col("src") === "s").collect().map(_.getLong(0)).toSet
    keptS shouldBe order.take(2).toSet
    // t: single 6-token doc, before=0 < 4 → kept whole
    out.filter(col("src") === "t").count() shouldBe 1L
    // schema passes through unchanged (helper cols dropped)
    out.columns.toSeq shouldBe Seq("id", "src", "text")
  }

  test("repeatByWeight: copy counts per stratum, weight 0 drops the stratum") {
    val df = Seq((1L, "hi"), (2L, "lo"), (3L, "drop"), (4L, "mid"))
      .toDF("id", "src")
    val out = TrainingData.repeatByWeight(df, "src",
      Map("hi" -> 3, "drop" -> 0), defaultCopies = 1)
    rowSet(out) shouldBe Set(
      Seq(1L, "hi", 0), Seq(1L, "hi", 1), Seq(1L, "hi", 2),
      Seq(2L, "lo", 0), Seq(4L, "mid", 0))
  }

  test("uniformSample: deterministic for fixed seed and layout") {
    val df = (1L to 1000L).toDF("id")
    val a = TrainingData.uniformSample(df, 0.1, seed = 7).collect().map(_.getLong(0)).toSet
    val b = TrainingData.uniformSample(df, 0.1, seed = 7).collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size.toDouble should be > 40.0
    a.size.toDouble should be < 200.0
  }

  test("saltedJoin ≡ plain join, including a hot key") {
    val left = ((1 to 500).map(_ => ("hot", "l")) ++
      (1 to 50).map(i => (s"k$i", "l"))).toDF("k", "lv")
    val right = Seq(("hot", 1), ("k1", 2), ("k2", 3), ("missing", 4))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), salts = 8)
    salted.count() shouldBe plain.count()
    rowSet(salted.groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s"))) shouldBe
      rowSet(plain.groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s")))
  }

  test("skewReport: heaviest keys first with shares") {
    val df = ((1 to 90).map(_ => "hot") ++ (1 to 10).map(_ => "cold")).toDF("k")
    val rep = SkewJoin.skewReport(df, Seq("k")).collect()
    rep.head.getString(0) shouldBe "hot"
    rep.head.getAs[Double]("share") shouldBe 0.9 +- 1e-9
  }

  test("trainingOrder: seeded permutation, layout-independent, seed-sensitive") {
    val df = (1L to 300L).toDF("id")
    val a = TrainingData.trainingOrder(df, Seq(col("id")), "s1")
    // permutation: same rows, none lost or duplicated
    a.select("id").as[Long].collect().sorted shouldBe (1L to 300L).toArray
    // layout-independent: the key mapping survives a repartition
    val b = TrainingData.trainingOrder(df.repartition(7), Seq(col("id")), "s1")
    rowSet(a) shouldBe rowSet(b)
    // emitted order follows order_key on any collected prefix
    val keys = a.select("order_key").as[Long].collect()
    keys.toSeq shouldBe keys.sorted.toSeq
    // a different seed is a different permutation
    val c = TrainingData.trainingOrder(df, Seq(col("id")), "s2")
    c.select("id").as[Long].collect().toSeq should not be
      a.select("id").as[Long].collect().toSeq
  }

  test("emitBatches: bin contents are layout-independent, truncation " +
      "caps the stream, and the sharded form packs per shard") {
    val docs = (1L to 60L).map { i =>
      (i, (if (i % 2 == 0) "alpha " else "beta ") * (i % 9 + 2).toInt +
        s"tail$i", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val merges = Seq(("a", "l"), ("t", "a"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TrainingData.emitBatches(df, "doc_id", "text", merges,
        maxTokens = 8, budget = 40, seed = "7")
    val out = run(docs)
    // layout-independent: any input partitioning → the same rows
    rowSet(out) shouldBe rowSet(run(docs.repartition(7)))
    rowSet(out) shouldBe rowSet(run(docs.coalesce(1)))
    val rows = out.orderBy("order_key", "doc_id").collect()
    // truncation: no stream exceeds the context budget, and the cap
    // actually fires on the long docs
    rows.map(_.getInt(3)).max shouldBe 8
    // the pack cut rule: tokens_before is the running sum in
    // (order_key, id) order, bin = the integer cut
    rows.foldLeft(0L) { (acc, r) =>
      r.getLong(4) shouldBe acc
      r.getInt(5) shouldBe (acc / 40).toInt
      acc + r.getInt(3)
    }
    // seed moves the permutation wholesale
    val reseeded = TrainingData.emitBatches(docs, "doc_id", "text",
      merges, maxTokens = 8, budget = 40, seed = "8")
    reseeded.orderBy("order_key", "doc_id").collect()
      .map(_.getLong(0)).toSeq should not be rows.map(_.getLong(0)).toSeq
    // sharded: each shard packs independently with its own running
    // sum — exactly the global rule applied within the shard
    val shardedDf = TrainingData.emitBatches(docs, "doc_id", "text",
      merges, maxTokens = 8, budget = 40, seed = "7",
      shard = Some("source"))
    val sharded = shardedDf
      .orderBy("source", "order_key", "doc_id").collect()
    sharded.groupBy(_.getString(6)).foreach { case (_, rs) =>
      rs.foldLeft(0L) { (acc, r) =>
        r.getLong(4) shouldBe acc
        acc + r.getInt(3)
      }
    }
    // the scale claim, pinned in the PLAN: the sharded window
    // exchanges on the shard key (parallel per-shard sorts), never
    // the global form's SinglePartition funnel
    val shardedPlan = shardedDf.queryExecution.executedPlan.toString
    val globalPlan = run(docs).queryExecution.executedPlan.toString
    withClue(shardedPlan) {
      shardedPlan should not include "SinglePartition"
      shardedPlan should include regex "hashpartitioning\\(source"
    }
    withClue(globalPlan) {
      globalPlan should include("SinglePartition")
    }
  }

  test("emitBatches: curriculum phases SEQUENCE the stream; the seeded " +
      "shuffle runs within each phase") {
    val docs = (1L to 60L).map { i =>
      (i, (if (i % 2 == 0) "alpha " else "beta ") * (i % 9 + 2).toInt +
        s"tail$i", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val merges = Seq(("a", "l"), ("t", "a"))
    val out = TrainingData.emitBatches(docs, "doc_id", "text", merges,
        maxTokens = 8, budget = 40, seed = "7",
        phaseCols = Seq(when(col("source") === "src0", 1).otherwise(0)))
      .orderBy("tokens_before").collect()
    // phase from the fixture rule: src0 ⇔ doc_id % 3 == 0 → phase 1
    val phases = out.map(r => if (r.getLong(0) % 3 == 0) 1 else 0)
    // non-decreasing: every phase-0 row precedes every phase-1 row
    phases.toSeq shouldBe phases.sorted.toSeq
    phases.toSet shouldBe Set(0, 1) // both phases populated
    // within each phase the seeded order_key ascends (the shuffle
    // runs inside the phase, not across it)
    out.zip(phases).groupBy(_._2).values.foreach { rs =>
      val keys = rs.map(_._1.getLong(1)).toSeq
      keys shouldBe keys.sorted
    }
    // the running sum is continuous ACROSS the phase boundary (one
    // stream, staged — not independent per-phase streams)
    out.foldLeft(0L) { (acc, r) =>
      r.getLong(4) shouldBe acc
      acc + r.getInt(3)
    }
  }

  test("emitChunks: every block sums to EXACTLY the budget (final block " +
      "excepted), pieces reconstruct the stream, sharded plan never funnels") {
    val docs = (1L to 60L).map { i =>
      (i, (if (i % 2 == 0) "alpha " else "beta ") * (i % 9 + 2).toInt +
        s"tail$i", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val merges = Seq(("a", "l"), ("t", "a"))
    val chunksDf = TrainingData.emitChunks(docs, "doc_id", "text", merges,
      maxTokens = 8, budget = 40, seed = "7")
    val rows = chunksDf.collect()
    // the face's whole point vs emitBatches: every block except the
    // stream's last sums to exactly the budget — no overflow, no
    // underflow; block ids dense from 0
    val perBlock = rows.groupBy(_.getInt(2)).view
      .mapValues(_.map(_.getInt(4)).sum).toMap
    val lastBlock = perBlock.keys.max
    perBlock.keySet shouldBe (0 to lastBlock).toSet
    perBlock.foreach { case (b, sum) =>
      if (b < lastBlock) sum shouldBe 40 else sum should be <= 40
    }
    // reconstruction: per document, pieces in block order concatenate
    // back to exactly the truncated stream emitBatches carries, with
    // `off` the running within-doc offset
    val full = TrainingData.emitBatches(docs, "doc_id", "text", merges,
        maxTokens = 8, budget = 40, seed = "7")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val ordered = rs.sortBy(_.getInt(2))
      ordered.flatMap(_.getSeq[String](5)).toSeq shouldBe full(id)
      ordered.foldLeft(0) { (acc, r) =>
        r.getInt(3) shouldBe acc
        acc + r.getInt(4)
      }
    }
    // layout-independent, like every emission face
    rowSet(chunksDf) shouldBe rowSet(TrainingData.emitChunks(
      docs.repartition(7), "doc_id", "text", merges, 8, 40, "7"))
    // sharded: exact blocks per shard, and the plan exchanges on the
    // shard key — the emitBatches no-SinglePartition pin extended
    val sharded = TrainingData.emitChunks(docs, "doc_id", "text", merges,
      maxTokens = 8, budget = 40, seed = "7", shard = Some("source"))
    sharded.collect().groupBy(_.getString(6)).foreach { case (_, rs) =>
      val pb = rs.groupBy(_.getInt(2)).view
        .mapValues(_.map(_.getInt(4)).sum).toMap
      val lb = pb.keys.max
      pb.foreach { case (b, s) => if (b < lb) s shouldBe 40 }
    }
    val plan = sharded.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "SinglePartition"
      plan should include regex "hashpartitioning\\(source"
    }
  }

  test("emitChunksRepeated: weighted × curriculum × exact blocks compose — " +
      "budget sums, copy scatter, phase order, sharded plan never funnels") {
    val docs = (1L to 60L).map { i =>
      (i, (if (i % 2 == 0) "alpha " else "beta ") * (i % 9 + 2).toInt +
        s"tail$i", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val merges = Seq(("a", "l"), ("t", "a"))
    val weights = Map("src0" -> 3, "src2" -> 0)
    val phases = Seq(when(col("source") === "src0", 1).otherwise(0))
    val chunksDf = TrainingData.emitChunksRepeated(docs, "doc_id", "text",
      merges, maxTokens = 8, budget = 40, seed = "7",
      strataCol = "source", weights = weights, phaseCols = phases)
    val rows = chunksDf.collect()
    // exact blocks survive the composition: every block but the last
    // sums to the budget, ids dense from 0
    val perBlock = rows.groupBy(_.getInt(3)).view
      .mapValues(_.map(_.getInt(5)).sum).toMap
    val lastBlock = perBlock.keys.max
    perBlock.keySet shouldBe (0 to lastBlock).toSet
    perBlock.foreach { case (b, sum) =>
      if (b < lastBlock) sum shouldBe 40 else sum should be <= 40
    }
    // weights: src0 docs (doc_id % 3 == 0) carry copies {0,1,2}, src2
    // (doc_id % 3 == 2) none, others copy 0 only
    val copies = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(1)).toSet).toMap
    copies.foreach { case (id, cs) =>
      cs shouldBe (id % 3 match {
        case 0 => Set(0, 1, 2)
        case 1 => Set(0)
        case 2 => fail(s"src2 doc $id must be dropped")
      })
    }
    // reconstruction per (doc, copy) against the packing frame —
    // pieces concatenate back to the example's truncated stream
    val full = TrainingData.emitBatchesRepeated(docs, "doc_id", "text",
        merges, maxTokens = 8, budget = 40, seed = "7",
        strataCol = "source", weights = weights, phaseCols = phases)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[String](3)).toMap
    rows.groupBy(r => (r.getLong(0), r.getInt(1))).foreach { case (k, rs) =>
      val ordered = rs.sortBy(_.getInt(3))
      ordered.flatMap(_.getSeq[String](6)).toSeq shouldBe full(k)
      ordered.foldLeft(0) { (acc, r) =>
        r.getInt(4) shouldBe acc
        acc + r.getInt(5)
      }
    }
    // curriculum: every phase-0 piece (non-src0) precedes every
    // phase-1 piece (src0) in the block stream — compare by
    // (block, off-within-doc is irrelevant): max phase-0 block ≤ min
    // phase-1 block +- the shared boundary block
    val p0max = rows.filter(_.getLong(0) % 3 != 0).map(_.getInt(3)).max
    val p1min = rows.filter(_.getLong(0) % 3 == 0).map(_.getInt(3)).min
    p1min should be >= p0max - 1 // phases share at most the boundary block
    // copy SCATTER: src0 docs' three copies land at three distinct
    // stream offsets, not adjacent — at least one doc's copies span
    // different blocks
    val scattered = rows.filter(_.getLong(0) % 3 == 0)
      .groupBy(_.getLong(0))
      .exists { case (_, rs) => rs.map(_.getInt(3)).toSet.size > 1 }
    scattered shouldBe true
    // layout-independent like every emission face
    rowSet(chunksDf) shouldBe rowSet(TrainingData.emitChunksRepeated(
      docs.repartition(7), "doc_id", "text", merges, 8, 40, "7",
      strataCol = "source", weights = weights, phaseCols = phases))
    // sharded: the plan exchanges on the shard key, never funnels
    val sharded = TrainingData.emitChunksRepeated(docs, "doc_id", "text",
      merges, maxTokens = 8, budget = 40, seed = "7",
      strataCol = "source", weights = weights, shard = Some("source"),
      phaseCols = phases)
    val plan = sharded.queryExecution.executedPlan.toString
    withClue(plan) {
      plan should not include "SinglePartition"
      plan should include regex "hashpartitioning\\(source"
    }
    // shard rides LAST (the emitBatches column contract)
    sharded.columns.last shouldBe "source"
  }

  test("emitTakedownReport: touched blocks, counts, and the re-emission " +
      "radius; empty takedown set → empty report") {
    // hand-sized fixture: budget 10; four docs in id order (seed-free:
    // feed pre-packed pieces straight into the report)
    val chunks = Seq(
      // (doc, order, block, off, n_tok)
      (1L, 1L, 0, 0, 10), // block 0: doc 1 only
      (2L, 2L, 1, 0, 6),  // block 1: docs 2+3
      (3L, 3L, 1, 0, 4),
      (3L, 3L, 2, 4, 8),  // block 2: doc 3 tail + doc 4
      (4L, 4L, 2, 0, 2),
      (4L, 4L, 3, 2, 5)   // block 3 (last): doc 4 tail
    ).toDF("doc_id", "order_key", "block", "off", "n_tok")
    val del = Seq(3L).toDF("doc_id")
    val out = TrainingData.emitTakedownReport(chunks, del, "doc_id")
      .orderBy("block").collect()
    // doc 3 touches blocks 1 and 2 — exactly those are reported
    out.map(_.getInt(0)).toSeq shouldBe Seq(1, 2)
    val b1 = out(0); val b2 = out(1)
    b1.getLong(1) shouldBe 1L  // n_del_pieces
    b1.getLong(2) shouldBe 4L  // n_del_tokens
    b1.getLong(3) shouldBe 1L  // n_live_pieces (doc 2)
    b2.getLong(2) shouldBe 8L
    // radius: first affected = 1, stream's last block = 3 → 3 shifted
    out.foreach { r =>
      r.getInt(4) shouldBe 1
      r.getInt(5) shouldBe 3
    }
    // an empty takedown set reports nothing
    TrainingData.emitTakedownReport(chunks,
      Seq.empty[Long].toDF("doc_id"), "doc_id").count() shouldBe 0L
  }

  test("emitInterleaved: placeholder leads media docs, rides on top of " +
      "the text budget, and its (block, pos) is the manifest math") {
    val docs = (1L to 40L).map { i =>
      (i, "alpha beta " * (i % 5 + 1).toInt + s"tail$i")
    }.toDF("doc_id", "text")
    val media = (1L to 40L).filter(_ % 2 == 0).map(i => (i, i * 1000L))
      .toDF("mid", "h")
    val merges = Seq(("a", "l"), ("t", "a"))
    val out = TrainingData.emitInterleaved(docs, "doc_id", "text", merges,
      maxTokens = 8, budget = 25, seed = "7",
      media = media, mediaIdCol = "mid", hashCol = "h")
    val rows = out.collect()
    val noMedia = TrainingData.emitBatches(docs, "doc_id", "text", merges,
        maxTokens = 8, budget = 25, seed = "7")
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val toks = r.getSeq[String](2)
      if (id % 2 == 0) {
        r.get(6) shouldBe id * 1000L               // media_hash joined
        toks.head shouldBe "<img>"                 // placeholder leads
        // placeholder rides ON TOP of the truncated text budget
        r.getInt(3) shouldBe noMedia(id).getInt(3) + 1
        toks.tail shouldBe noMedia(id).getSeq[String](2)
      } else {
        assert(r.isNullAt(6))
        r.getInt(3) shouldBe noMedia(id).getInt(3)
        toks shouldBe noMedia(id).getSeq[String](2)
      }
    }
    // manifest math: the placeholder's stream offset IS tokens_before,
    // so block/pos = div/mod — and the running sum stays consistent
    rows.sortBy(r => (r.getLong(1), r.getLong(0))).foldLeft(0L) {
      (acc, r) =>
        r.getLong(4) shouldBe acc
        acc + r.getInt(3)
    }
    // alignment: exactly one placeholder per media doc, none elsewhere
    rows.map(r => r.getSeq[String](2).count(_ == "<img>")).sum shouldBe
      rows.count(_.getLong(0) % 2 == 0)
  }

  test("emitInterleaved/Multi: a NULL position on a media row means " +
      "head placement, never a null splice poisoning the stream") {
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "one two three four five")).toDF("doc_id", "text")
    val merges = Seq(("a", "l"))
    // single-slot face: doc 1's pos is NULL → placeholder at offset 0
    val media = Seq((1L, 100L, Option.empty[Int]), (2L, 200L, Some(2)))
      .toDF("mid", "h", "pos")
    val out = TrainingData.emitInterleaved(docs, "doc_id", "text", merges,
        maxTokens = 8, budget = 25, seed = "7",
        media = media, mediaIdCol = "mid", hashCol = "h",
        posCol = Some("pos"))
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Int]("ph_off") shouldBe 0
    out(1L).getSeq[String](2).head shouldBe "<img>"
    // neither doc's token array is null and the running sum is intact
    out.values.foreach { r =>
      r.getSeq[String](2) should not be null
      r.getInt(3) should be > 0
    }
    // multi-slot face: one NULL-pos slot among real ones → offset 0
    val multi = Seq((1L, Option.empty[Int], 100L), (1L, Some(3), 101L))
      .toDF("mid", "pos", "h")
    val m = TrainingData.emitInterleavedMulti(docs, "doc_id", "text",
        merges, maxTokens = 8, budget = 25, seed = "7",
        media = multi, mediaIdCol = "mid", posCol = "pos", hashCol = "h")
      .collect().map(r => r.getLong(0) -> r).toMap
    val slots = m(1L).getSeq[org.apache.spark.sql.Row](6)
    slots.map(_.getInt(0)) shouldBe Seq(0, 4) // clamped-0 first, 3+1
    m(1L).getSeq[String](2).count(_ == "<img>") shouldBe 2
  }

  test("emitInterleavedChunks: positional splice lands the placeholder at " +
      "its token offset (clamped), blocks stay exact, pieces reconstruct") {
    val docs = (1L to 40L).map { i =>
      (i, "alpha beta " * (i % 5 + 1).toInt + s"tail$i")
    }.toDF("doc_id", "text")
    // pos exercises head (0), middle, and far-out-of-range (clamp→append)
    val media = (1L to 40L).filter(_ % 2 == 0)
      .map(i => (i, i * 1000L, (i % 7 * 3).toInt))
      .toDF("mid", "h", "pos")
    val merges = Seq(("a", "l"), ("t", "a"))
    val pieces = TrainingData.emitInterleavedChunks(docs, "doc_id", "text",
      merges, maxTokens = 8, budget = 25, seed = "7",
      media = media, mediaIdCol = "mid", hashCol = "h",
      posCol = Some("pos")).collect()
    // per doc: pieces concatenate back; the placeholder sits exactly at
    // ph_off; text tokens around it are the truncated stream unsplit
    val noMedia = TrainingData.emitBatches(docs, "doc_id", "text", merges,
        maxTokens = 8, budget = 25, seed = "7")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    pieces.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val full = rs.sortBy(_.getInt(5)).flatMap(_.getSeq[String](8)).toSeq
      if (id % 2 == 0) {
        val t = noMedia(id)
        val p = math.min((id % 7 * 3).toInt, t.size) // the clamp rule
        rs.head.getInt(3) shouldBe p                 // ph_off reported
        full shouldBe (t.take(p) :+ "<img>") ++ t.drop(p)
        // the block/pos manifest math: the placeholder is at stream
        // offset tokens_before + ph_off, inside exactly ONE piece
        val tb = rs.head.getLong(4)
        val inPiece = rs.filter(r =>
          p >= r.getInt(6) && p < r.getInt(6) + r.getInt(7))
        inPiece.length shouldBe 1
        inPiece.head.getInt(5) shouldBe ((tb + p) / 25).toInt
      } else {
        assert(rs.head.isNullAt(2)) // no media_hash
        full shouldBe noMedia(id)
      }
    }
    // exact blocks survive the splice: every block but the last sums
    // to the budget
    val perBlock = pieces.groupBy(_.getInt(5)).view
      .mapValues(_.map(_.getInt(7)).sum).toMap
    val last = perBlock.keys.max
    perBlock.foreach { case (b, s) => if (b < last) s shouldBe 25 }
  }

  test("emitInterleavedMulti: several slots splice at clamped positions in " +
      "(pos, hash) order; realized offsets shift by earlier inserts") {
    val docs = Seq((1L, "alpha beta alpha beta alpha beta tail1"),
      (2L, "alpha beta tail2")).toDF("doc_id", "text")
    // doc 1: three slots — head, middle, far out of range (clamp→end);
    // two share position 2 (hash breaks the tie). doc 2: none.
    val media = Seq((1L, 0, 500L), (1L, 2, 300L), (1L, 2, 100L),
      (1L, 99, 900L)).toDF("mid", "pos", "h")
    val merges = Seq(("a", "l"))
    val out = TrainingData.emitInterleavedMulti(docs, "doc_id", "text",
        merges, maxTokens = 50, budget = 100, seed = "7",
        media = media, mediaIdCol = "mid", posCol = "pos", hashCol = "h")
      .collect().map(r => r.getLong(0) -> r).toMap
    val base = TrainingData.emitBatches(docs, "doc_id", "text", merges,
        maxTokens = 50, budget = 100, seed = "7")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val t1 = base(1L)
    // slot order: (0,500), (2,100), (2,300), (clamped n,900) →
    // realized offsets 0, 3, 4, n+3
    val slots = out(1L).getSeq[org.apache.spark.sql.Row](6)
    slots.map(s => (s.getInt(0), s.getLong(1))) shouldBe Seq(
      (0, 500L), (3, 100L), (4, 300L), (t1.size + 3, 900L))
    // the spliced stream: placeholders exactly at the realized offsets
    val toks = out(1L).getSeq[String](2)
    toks.size shouldBe t1.size + 4
    slots.foreach(s => toks(s.getInt(0)) shouldBe "<img>")
    toks.filterNot(_ == "<img>") shouldBe t1
    out(1L).getInt(3) shouldBe t1.size + 4
    // text-only doc untouched, media null
    assert(out(2L).isNullAt(6))
    out(2L).getSeq[String](2) shouldBe base(2L)
  }

  test("spanCorrupt: sentinel-splice reconstructs the doc; tail block " +
      "untouched; short docs pass through") {
    val text = (1 to 47).map(i => s"w$i").mkString(" ") // 2 full blocks + 7
    val r = TrainingData.spanCorrupt(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
    r.getInt(3) shouldBe 2
    val input = r.getString(1)
    val target = r.getString(2)
    // token accounting: each block trades 3 tokens for 1 sentinel
    input.split(" ").length shouldBe 47 - 2 * 3 + 2
    target.split(" ").length shouldBe 2 * 4
    // the round-trip contract: splicing each target span back over
    // its sentinel reconstructs the document exactly
    val spans = target.split("<extra_id_").drop(1).map { seg =>
      seg.takeWhile(_ != '>').toInt ->
        seg.dropWhile(_ != '>').drop(1).trim
    }.toMap
    val rebuilt = "<extra_id_(\\d+)>".r
      .replaceAllIn(input, m => spans(m.group(1).toInt))
    rebuilt shouldBe text
    // the partial tail block is never corrupted
    (41 to 47).foreach(i => input should include(s"w$i"))
    // a doc under one block is untouched with an empty target
    val short = TrainingData.spanCorrupt(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text").head()
    short.getString(1) shouldBe "a b c"
    short.getString(2) shouldBe ""
    short.getInt(3) shouldBe 0
  }

  test("DSIR: weight signs follow the corpora; resample is exact-n, " +
      "layout-independent, and target-leaning") {
    val target = (1L to 40L).map(i => (i, "clean fluent prose sentence"))
      .toDF("doc_id", "text")
    val raw = ((101L to 140L).map(i => (i, "clean fluent prose sentence")) ++
      (201L to 240L).map(i => (i, "zzz spam qqq garble noise")))
      .toDF("doc_id", "text")
    val w = TrainingData.importanceWeightsMicro(raw, target, "text")
    val wm = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // target-corpus terms score positive, raw-only terms negative
    wm("fluent") should be > 0L
    wm("spam") should be < 0L
    val picked = TrainingData.importanceResample(raw, w, "doc_id", "text", 20)
    val ids = picked.select("id").collect().map(_.getLong(0)).toSet
    ids.size shouldBe 20
    ids.subsetOf((101L to 140L).toSet ++ (201L to 240L).toSet) shouldBe true
    // selection leans hard toward the target-like half: its docs all
    // share one (large positive) sum_llr, the spam half one large
    // negative — Gumbel noise cannot bridge a gap this wide often
    ids.count(_ < 200L) should be >= 15
    // deterministic under relayout
    val again = TrainingData.importanceResample(
      raw.repartition(7), w, "doc_id", "text", 20)
    again.select("id").collect().map(_.getLong(0)).toSet shouldBe ids
  }

  test("mixturePlan: closed-form cut equals the iterative water-filling " +
      "fixpoint across budgets; caps cascade; edge sources plan sanely") {
    // catalog: a tiny source that caps first, a mid source that caps
    // only AFTER a's freed budget re-spreads (the cascade), a deep
    // source that never caps, a weighted source ABSENT from the
    // corpus (avail 0), and a corpus source absent from the weights
    // (weight 0). e's text rows exist so weight-0 handling is real.
    val corpus = Seq(
      "a" -> 100, "b" -> 1000, "c" -> 10000, "e" -> 500).flatMap {
      case (s, n) => Seq((s, Seq.fill(n)("t").mkString(" ")))
    }.toDF("source", "text")
    val weights = Seq(("a", 10), ("b", 10), ("c", 10), ("d", 5))
      .toDF("source", "weight")
    val cat = Map("a" -> (100L, 10), "b" -> (1000L, 10),
      "c" -> (10000L, 10), "d" -> (0L, 5), "e" -> (500L, 0))
    // independent reference: the NAIVE iterative fixpoint (cap, then
    // re-spread over the uncapped pool, repeat until stable)
    def reference(budget: Long, r: Int): Map[String, Long] = {
      var capped = Set.empty[String]
      var stable = false
      while (!stable) {
        val bRem = budget - capped.toSeq.map(s => r * cat(s)._1).sum
        val wRem = cat.collect {
          case (s, (_, w)) if !capped(s) => w.toLong }.sum
        val fresh = cat.keys.filter(s => !capped(s) &&
          r * cat(s)._1 * wRem < cat(s)._2.toLong * bRem)
        if (fresh.isEmpty) stable = true else capped ++= fresh
      }
      val bFin = budget - capped.toSeq.map(s => r * cat(s)._1).sum
      val wFin = cat.collect {
        case (s, (_, w)) if !capped(s) => w.toLong }.sum
      cat.map { case (s, (a, w)) =>
        s -> (if (capped(s)) r * a
              else if (wFin == 0) 0L else w.toLong * bFin / wFin)
      }
    }
    Seq(0L, 500L, 5000L, 12000L, 40000L, 100000L).foreach { budget =>
      val plan = TrainingData.mixturePlan(corpus, weights, budget)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getInt(2), r.getLong(4), r.getBoolean(6))))
        .toMap
      val ref = reference(budget, 4)
      withClue(s"budget=$budget: ") {
        plan.keySet shouldBe cat.keySet // union of corpus and weights
        cat.foreach { case (s, (avail, w)) =>
          val (pAvail, pW, planned, capped) = plan(s)
          pAvail shouldBe avail
          pW shouldBe w
          planned shouldBe ref(s)
          planned should be <= 4L * avail  // never over the cap
          if (capped) planned shouldBe 4L * avail
        }
        plan.values.map(_._3).sum should be <= budget // never overshoots
      }
    }
    // the 12000 budget exercises the CASCADE: a caps at 400, the
    // re-spread pushes b over its 4000 cap too, c absorbs the rest
    val p12 = TrainingData.mixturePlan(corpus, weights, 12000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    p12("a") shouldBe 400L
    p12("b") shouldBe 4000L
    p12("c") shouldBe 7600L
    p12("d") shouldBe 0L
    p12("e") shouldBe 0L
    // duplicate weight rows fail loud: the full-outer join would emit
    // one plan row per duplicate and the window sums would double-
    // count the source's stock, silently overshooting the budget
    val dupW = Seq(("a", 10), ("a", 20), ("b", 10))
      .toDF("source", "weight")
    val ex = intercept[Exception] {
      TrainingData.mixturePlan(corpus, dupW, 1000L).collect()
    }
    ex.getMessage should include("duplicate weight rows")
  }
}
