package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Interaction

/** Property-based invariants (SURVEY.md §5 #3). Exhaustive where the
  * domain is small (bucket edges); ScalaCheck-generated datasets where
  * it isn't — each property evaluates whole datasets per Spark job, not
  * one job per sample.
  */
class PropertySpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: org.scalacheck.Prop, minTests: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  test("activenessBucket: total partition of 0..100 — [1,31] buckets, else error") {
    val out = (0 to 100).toDF("d")
      .select(col("d"), Interaction.activenessBucket(col("d")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val buckets = Set("very low", "low", "moderate", "high", "very high")
    (0 to 100).foreach { d =>
      if (d >= 1 && d <= 31) buckets should contain(out(d))
      else out(d) shouldBe "error"
    }
    // each bucket is exactly 7 days wide except very high (3)
    val widths = (1 to 31).groupBy(out).view.mapValues(_.size).toMap
    widths shouldBe Map("very low" -> 7, "low" -> 7, "moderate" -> 7,
      "high" -> 7, "very high" -> 3)
  }

  private val rowsGen: Gen[List[(String, String, Long)]] =
    Gen.listOfN(40, for {
      c <- Gen.choose(0, 4)
      t <- Gen.oneOf("A", "B", "C")
      v <- Gen.choose(0L, 1000L)
    } yield (s"c$c", t, v))

  test("pivot row sums equal pre-pivot group sums for arbitrary data") {
    check(forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("Contract", "Type", "TotalDuration")
        val piv = Interaction.statistics(df, Seq("A", "B", "C"))
          .withColumn("rowSum", col("A") + col("B") + col("C"))
          .select("Contract", "rowSum")
        val direct = df.groupBy("Contract").agg(sum("TotalDuration"))
        piv.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet
      }
    }, minTests = 5)
  }

  test("union-of-splits ≡ whole table (U1: split + unionByName reordered)") {
    check(forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0L, 99L))),
      Gen.choose(0, 9)) { (rows, p) =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val a = df.filter(col("k") <= p).select("v", "k") // columns reordered
        val b = df.filter(col("k") > p)
        val rebuilt = b.unionByName(a)
        rebuilt.count() == df.count() &&
          rebuilt.agg(sum("v")).head().getLong(0) ==
            df.agg(sum("v")).head().getLong(0)
      }
    }, minTests = 5)
  }

  test("simhash expression ≡ aggregation twin on arbitrary texts") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "the", "of")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check(forAll(Gen.listOfN(12, textGen)) { texts =>
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        graft.ext.Dedup.simhash(df, "doc_id", "text")
          .collect().map(_.toSeq).toSet ==
          graft.ext.Dedup.simhashAgg(df, "doc_id", "text")
            .collect().map(_.toSeq).toSet
      }
    }, minTests = 5)
  }

  test("IvfSupport.probes: exact top-nProbe centroids by (dot desc, cid asc)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.listOfN(6, Gen.choose(-5.0, 5.0))
    val centsGen = Gen.listOfN(5, vecGen)
    check(forAll(vecGen, centsGen, Gen.choose(1, 5)) { (v, cs, nProbe) =>
      val cents = cs.map(_.toArray).toArray
      val got = graft.functions.IvfSupport
        .probes(new GenericArrayData(v.toArray), cents, nProbe, isFloat = false)
        .toIntArray().toSeq
      val dots = cents.map(c => c.zip(v).map { case (a, b) => a * b }.sum)
      val want = dots.indices.sortBy(i => (-dots(i), i)).take(nProbe)
      got == want
    }, minTests = 30)
  }

  /** Random corpora with planted duplication: words drawn from a
    * 12-token vocabulary (dense shingle overlap), ~1/3 of docs
    * repeated verbatim (exercises the exact-collapse expansion), doc
    * count 2-30.
    */
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 30)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 10)
      ws <- Gen.listOfN(len, Gen.oneOf(
        "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l"))
    } yield ws.mkString(" "))
    dups <- Gen.listOfN(n / 3 + 1, Gen.choose(0, n - 1))
  } yield (docs ++ dups.map(docs)).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  test("ngram pairs: triangle path ≡ plain self-join on arbitrary duplicated corpora") {
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val plain = graft.ext.Dedup.ngramJaccardPairs(df, "doc_id", "text",
        minJaccard = 0.2, hotDf = Int.MaxValue).collect().toSet
      // hotDf=2 routes every pair-producing key through triangle cells
      val tri = graft.ext.Dedup.ngramJaccardPairs(df, "doc_id", "text",
        minJaccard = 0.2, hotDf = 2, hotBuckets = 3).collect().toSet
      tri == plain
    }, minTests = 8)
  }

  test("minhash pairs: collapsed pipeline ≡ uncollapsed LSH on arbitrary duplicated corpora") {
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      // round-4 form: LSH directly over every document, no collapse
      val sets = graft.ext.Dedup.docShingleSets(df, "doc_id", "text")
      val uncollapsed = graft.ext.Dedup.lshCandidatePairs(
          graft.ext.Dedup.lshBands(graft.ext.Dedup.minhashSignature(sets)))
        .join(sets.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
        .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
        .withColumn("shared",
          org.apache.spark.sql.functions.size(array_intersect(col("hs_a"), col("hs_b"))))
        .withColumn("jaccard", col("shared").cast("double") /
          (org.apache.spark.sql.functions.size(col("hs_a"))
            + org.apache.spark.sql.functions.size(col("hs_b"))
            - col("shared")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
        .collect().map(_.toSeq).toSet
      // hotDf=2 also routes every intra cluster through triangle cells;
      // Always pins the collapse on regardless of the Auto probe
      val collapsed = graft.ext.Dedup
        .minhashDedupPairs(df, "doc_id", "text", hotDf = 2, hotBuckets = 3,
          mode = graft.ext.Dedup.CollapseMode.Always)
        .collect().map(_.toSeq).toSet
      collapsed == uncollapsed
    }, minTests = 8)
  }

  test("collapse dial: Auto ≡ Always ≡ Never pair sets on arbitrary duplicated corpora") {
    // the pay-for-use probe may only change the PLAN, never the pairs
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      def pairs(m: graft.ext.Dedup.CollapseMode): Set[Seq[Any]] =
        graft.ext.Dedup.ngramJaccardPairs(df, "doc_id", "text",
            minJaccard = 0.2, mode = m)
          .collect().map(_.toSeq).toSet
      val always = pairs(graft.ext.Dedup.CollapseMode.Always)
      pairs(graft.ext.Dedup.CollapseMode.Never) == always &&
        pairs(graft.ext.Dedup.CollapseMode.Auto) == always
    }, minTests = 6)
  }

  /** Brute-force longest common token SUBSTRING (contiguous) — the
    * ground truth crossDocSpanRuns recovers via window islands.
    */
  private def lcsTokens(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  test("crossDocSpanRuns ≡ brute-force longest common token substring") {
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val got = graft.ext.Dedup.crossDocSpanRuns(df, "doc_id", "text",
          spanWords = 3, minRunWords = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val want = (for {
        (ia, ta) <- rows
        (ib, tb) <- rows if ia < ib
        l = lcsTokens(ta.split(" "), tb.split(" ")) if l >= 3
      } yield ((ia, ib), l.toLong)).toMap
      got == want
    }, minTests = 8)
  }

  test("span collapse dial: Auto ≡ Always ≡ Never pair sets (hot routing incl.)") {
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      def pairs(m: graft.ext.Dedup.CollapseMode): Set[Seq[Any]] =
        graft.ext.Dedup.crossDocSpanPairs(df, "doc_id", "text",
            spanWords = 3, hotDf = 2, hotBuckets = 3, mode = m)
          .collect().map(_.toSeq).toSet
      val always = pairs(graft.ext.Dedup.CollapseMode.Always)
      pairs(graft.ext.Dedup.CollapseMode.Never) == always &&
        pairs(graft.ext.Dedup.CollapseMode.Auto) == always
    }, minTests = 6)
  }

  test("minhash star edges: clusters over edges ≡ clusters over full pairs") {
    check(forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val universe = df.select(col("doc_id").as("id"))
      def labels(pairs: org.apache.spark.sql.DataFrame) =
        graft.ext.Dedup.nearDupClusters(universe, pairs)
          .collect().map(_.toSeq).toSet
      labels(graft.ext.Dedup.minhashDedupEdges(df, "doc_id", "text")) ==
        labels(graft.ext.Dedup.minhashDedupPairs(df, "doc_id", "text")
          .select("id_a", "id_b"))
    }, minTests = 8)
  }

  test("gapFill: dense per-key coverage, observed values exact, fills carry last observation") {
    val dayGen = Gen.choose(1, 25)
    val evGen = Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c")
      d <- dayGen
      v <- Gen.choose(0, 50)
    } yield (k, java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00"), v.toDouble))
    check(forAll(evGen) { rows =>
      val df = rows.toDF("k", "ts", "value")
      val out = graft.ops.TimeSeries.gapFill(df, "k", col("ts"), col("value"))
        .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
          r.getDouble(2), r.getBoolean(3)))
      val byKey = rows.groupBy(_._1)
      out.groupBy(_._1).forall { case (k, kr) =>
        val days = byKey(k).map(_._2.toLocalDateTime.toLocalDate).distinct
        val (lo, hi) = (days.min, days.max)
        val expectDays = Iterator.iterate(lo)(_.plusDays(1))
          .takeWhile(!_.isAfter(hi)).toSeq
        val obsSum = byKey(k).groupBy(_._2.toLocalDateTime.toLocalDate)
          .map { case (d, es) => d -> es.map(_._3).sum }
        // dense coverage, exact observed sums, fills = carry of the
        // most recent observed day's sum
        kr.map(_._2).toSeq.sorted == expectDays &&
          kr.forall { case (_, d, v, filled) =>
            val carrySrc = obsSum.keys.filter(!_.isAfter(d)).max
            filled == !obsSum.contains(d) && v == obsSum(carrySrc)
          }
      }
    }, minTests = 8)
  }

  test("bpePairs: pair-count mass equals token transitions over the corpus") {
    val wordGen = Gen.oneOf("a", "b", "c", "Dd", "ee")
    val textGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    check(forAll(Gen.listOfN(10, textGen)) { texts =>
      val df = texts.toDF("text")
      val out = graft.ext.TextAnalysis.bpePairs(df, "text", topK = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val expectedMass = texts.map(t => math.max(t.split(" ").length - 1, 0)).sum
      out.map(_._2).sum == expectedMass &&
        out.forall { case (p, c) => c >= 1 && p == p.toLowerCase } &&
        out.sortBy { case (p, c) => (-c, p) }.toSeq == out.toSeq
    }, minTests = 8)
  }

  test("text-stat byte-walks ≡ regexp_count on arbitrary strings incl. multi-byte") {
    // chars chosen to hit every branch: ASCII alnum, the six \s chars,
    // ASCII punct, 2-byte (é), 3-byte (中), and a surrogate-pair
    // 4-byte codepoint (𝄞) — each is ONE regex char and must count once
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"),
      Gen.oneOf(".", ",", "!", "-", "_", "~"), Gen.oneOf("é", "ß", "中", "語", "𝄞", "🙂"))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    check(forAll(Gen.listOfN(25, textGen)) { texts =>
      texts.isEmpty || {
        val df = texts.toDF("text")
        val got = df.select(
          graft.functions.TextStatsFunctions.non_alnum_count(col("text")),
          graft.functions.TextStatsFunctions.bpe_token_count(col("text")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val want = df.select(
          regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("long"),
          regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]")).cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        got == want
      }
    }, minTests = 8)
  }

  test("customerType: every (activeness, duration) lands in exactly one segment") {
    val activeness = Seq("very low", "low", "moderate", "high", "very high", "error")
    val durations = Seq(0.0, 9.99, 10.0, 10.01, 19.99, 20.0, 20.01, 100.0)
    val df = (for { a <- activeness; d <- durations } yield (a, d))
      .toDF("Activeness", "TotalDuration")
      .select(Interaction.customerTypeColumn(10.0, 20.0).as("t"))
    val types = Set("leaving", "need attention", "normal", "potential",
      "loyal", "VIP", "anomaly")
    df.collect().foreach(r => types should contain(r.getString(0)))
  }
}
