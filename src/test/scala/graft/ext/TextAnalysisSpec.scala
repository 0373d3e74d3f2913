package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-analysis operator semantics: token counts, ratios, language
  * ID argmax, order-sensitive fingerprinting, hash bounds.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCountWs: whitespace tokens") {
    singleValue(one("a bb ccc").select(
      TextAnalysis.tokenCountWs(col("text")))) shouldBe 3
    singleValue(one("single").select(
      TextAnalysis.tokenCountWs(col("text")))) shouldBe 1
  }

  test("tokenCountBpe: alpha runs, single digits, punctuation") {
    // "ab12, c!" → ab, 1, 2, ",", c, "!" = 6
    singleValue(one("ab12, c!").select(
      TextAnalysis.tokenCountBpe(col("text")))) shouldBe 6
  }

  test("stopwordRatio and punctRatio on known text") {
    // "the cat is on a mat!" → 7 tokens ("mat!" is not a stopword token);
    // stopwords: the, is, on, a = 4... tokens: the,cat,is,on,a,mat! → 6 tokens, 4 stop
    val t = "the cat is on a mat!"
    singleValue(one(t).select(round(
      TextAnalysis.stopwordRatio(col("text")), 6))) shouldBe
      (4.0 / 6.0 * 1e6).round / 1e6
    // punct: '!' of 20 chars
    singleValue(one(t).select(round(
      TextAnalysis.punctRatio(col("text")), 6))) shouldBe
      (1.0 / 20.0 * 1e6).round / 1e6
  }

  test("meanTokenLen: (chars - separators) / tokens") {
    // "ab cd" → (5 - 1) / 2 = 2.0
    singleValue(one("ab cd").select(
      TextAnalysis.meanTokenLen(col("text")))) shouldBe 2.0
  }

  test("qualityScore stays within [0, 1]") {
    val texts = Seq("", "a", "the " * 200, "x!@#$%", "normal text of the day")
      .toDF("text")
    val bad = texts.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1)
    bad.count() shouldBe 0L
  }

  test("langId: marker-word argmax, first language wins ties") {
    val df = Seq(
      (1L, "the house of the rising sun is here"),  // en
      (2L, "der hund und die katze ist hier"),      // de
      (3L, "el perro y los gatos es aqui"),         // es — 'y' and 'es' markers
      (4L, "nothing matching at all")               // all-zero → en (first)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "text").select("doc_id", "lang_pred")
    rowSet(out) shouldBe Set(
      Seq(1L, "en"), Seq(2L, "de"), Seq(3L, "es"), Seq(4L, "en"))
  }

  test("fingerprint: order-sensitive, deterministic, bounded") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe fps(3L)
    fps(1L) should not be fps(2L)
    fps.values.foreach { v =>
      v should be >= 0L
      v should be < HashDefs.FpMod
    }
  }

  test("tfIdfTopTerms: corpus-wide terms score low, distinctive terms rank first") {
    val df = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common filler words here")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: "common" tf=3 but df=3 (idf = ln(4/4)+1 = 1 → score 3);
    // "rare1" tf=1 df=1 (score = ln(2)+1 ≈ 1.693) — tf wins here
    top((1L, 1))._1 shouldBe "common"
    top((1L, 1))._4 shouldBe 3.0 +- 1e-9
    top((1L, 2))._1 shouldBe "rare1"
    // doc 2: rare2 (≈1.693) outranks common (1.0)
    top((2L, 1))._1 shouldBe "rare2"
    top((2L, 2))._1 shouldBe "common"
  }

  test("approx_top_k: heavy hitter survives the sketch in the APPROX regime") {
    import org.apache.spark.sql.functions.expr
    // 1000 distinct cold items + one hot item at 20% — maxItemsTracked
    // 64 ≪ 1001 distinct forces real sketch behavior; the frequent-
    // items guarantee is that a ≥ n/maxItemsTracked item is reported.
    val rows = (1 to 1000).map(i => s"cold_$i") ++ Seq.fill(250)("hot")
    val top = rows.toDF("item")
      .agg(expr("approx_top_k(item, 5, 64)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).collect()
    top.map(_.getString(0)) should contain("hot")
    // estimates may overcount (never undercount) in this sketch family
    val hot = top.find(_.getString(0) == "hot").get.getLong(1)
    hot should be >= 250L
  }

  test("redactPii: emails, IPs and phone runs replaced; clean text untouched") {
    val out = Seq(
      "mail me at john.doe+x@corp.example.org now",
      "server 192.168.0.1 port 8080",
      "call 555 123 4567 or 555-123-4567",
      "no pii here 12.5 degrees v1.2")
      .toDF("t").select(TextAnalysis.redactPii(col("t")).as("r"))
      .as[String].collect()
    out(0) shouldBe "mail me at <EMAIL> now"
    out(1) shouldBe "server <IP> port 8080"
    out(2) shouldBe "call <PHONE> or <PHONE>"
    out(3) shouldBe "no pii here 12.5 degrees v1.2"
  }

  test("rrfFuse: hand-computed fusion, single-list docs score one leg, " +
      "ties break to min id") {
    val sparse = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val dense = Seq((20L, 1), (40L, 3)).toDF("id", "rank")
    val out = TextAnalysis.rrfFuse(sparse, dense, k = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // doc 20 is in both lists: 1/62 + 1/61 — the fused winner
    out(0) shouldBe ((20L, 1,
      math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6))
    // single-list docs score only their own leg
    out(1) shouldBe ((10L, 2, math.rint(1.0 / 61 * 1e6) / 1e6))
    // 30 (sparse rank 3) and 40 (dense rank 3) tie at 1/63 → min id
    out(2)._1 shouldBe 30L
    out(3)._1 shouldBe 40L
    out(2)._3 shouldBe out(3)._3
  }

  test("stripMarkup: script/style dropped WITH contents, tags dropped, " +
      "entities decoded after tag removal, plain text untouched") {
    val out = Seq(
      "<html><head><script>if (a < b) { alert('x') }</script>" +
        "<style>p{margin:0}</style></head>" +
        "<body><h1>Hi</h1><p>one <b>two</b>   three</p></body></html>",
      // entity-escaped markup in PROSE must stay literal text, not
      // become a strippable tag (decode runs after tag removal)
      "tags like &lt;b&gt; stay; 5 &gt; 3 &amp;&amp; 2 &lt; 4",
      // double-escaped entity decodes ONE level
      "write &amp;lt; for a literal",
      "already clean text")
      .toDF("t").select(TextAnalysis.stripMarkup(col("t")).as("r"))
      .as[String].collect()
    out(0) shouldBe "Hi one two three"
    out(1) shouldBe "tags like <b> stay; 5 > 3 && 2 < 4"
    out(2) shouldBe "write &lt; for a literal"
    out(3) shouldBe "already clean text"
  }

  test("repeatedNgramRatio: distinct grams score 0, repeated grams the dup fraction") {
    val out = Seq(
      "a b c d e",   // 3 distinct 3-grams
      "a a a a a",   // one distinct 3-gram of 3 → 2/3 duplicated
      "a b",         // shorter than n
      "")            // empty
      .toDF("t")
      .select(round(TextAnalysis.repeatedNgramRatio(col("t"), 3), 6).as("r"))
      .as[Double].collect()
    out(0) shouldBe 0.0
    out(1) shouldBe 0.666667
    out(2) shouldBe 0.0
    out(3) shouldBe 0.0
  }

  test("tokenHash60: stable 60-bit non-negative hash, distinct across tokens") {
    val df = Seq("alpha", "beta", "alpha").toDF("t")
      .select(TextAnalysis.tokenHash60(col("t")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    hs(0) shouldBe hs(2)
    hs(0) should not be hs(1)
    hs.foreach { h =>
      h should be >= 0L
      h should be < (1L << 60)
    }
  }

  test("bm25Rank: hand-computed scores, ranks, zero-tf doc scores 0") {
    val df = Seq(
      (1L, "a a b"), // dl 3, tf 2
      (2L, "b c"),   // dl 2, tf 0 → score 0
      (3L, "a")      // dl 1, tf 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(df, "doc_id", "text", Seq("a"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3))).toList
    // N=3, df=2, avgdl=2; idf = ln((3-2+0.5)/2.5 + 1) = ln(1.6)
    val idf = math.log(1.6)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
    // length normalization: d3 (tf 1 in a 1-token doc, idf·2.2/1.75)
    // outranks d1 (tf 2 in a 3-token doc, idf·4.4/3.65)
    out.map(_._1) shouldBe List(3L, 1L, 2L)
    out.map(_._2) shouldBe List(1, 2, 3)
    out(0)._3 shouldBe (math.rint(s(1, 1) * 1e6) / 1e6 +- 1e-9)
    out(1)._3 shouldBe (math.rint(s(2, 3) * 1e6) / 1e6 +- 1e-9)
    out(2)._3 shouldBe 0.0
  }

  test("bpeTrain: textbook corpus learns es, est, lo, low in order") {
    import spark.implicits._
    // the classic BPE example: low x5, lower x2, newest x6, widest x3.
    // Hand trace: round 1 pair counts peak at 9 for both (e,s) and
    // (s,t) -> tie to (e,s); then (es,t)=9; then (l,o)=(o,w)=7 ties
    // to (l,o); then (lo,w)=7.
    val corpus = Seq(
      ("low " * 5).trim, ("lower " * 2).trim,
      ("newest " * 6).trim, ("widest " * 3).trim).toDF("text")
    val got = graft.ext.TextAnalysis.bpeTrain(corpus, "text", merges = 4)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    got shouldBe Array(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L))
  }

  test("bpeTrain: merge application is greedy left-to-right, stops when exhausted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "aaa": greedy (a,a) merge yields [aa, a], not [a, aa] or [aa, aa]
    val one = Seq("aaa").toDF("text")
    val rules = graft.ext.TextAnalysis.bpeTrain(one, "text", merges = 10)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2)))
    // round 1: (a,a) x1 (one non-overlapping occurrence... counts 2
    // adjacencies but application is greedy); round 2: (aa,a); then
    // a single symbol remains -> training exhausts before 10 rounds
    rules shouldBe Array(("a", "a"), ("aa", "a"))
    // expression-level greediness
    val sym = Seq(Seq("a", "a", "a", "a", "a")).toDF("sym")
      .select(graft.functions.BpeFunctions.bpe_merge(col("sym"), "a", "a").as("m"))
      .as[Seq[String]].head()
    sym shouldBe Seq("aa", "aa", "a")
  }

  test("bpeTrainLocal: bit-identical to bpeTrain (textbook + real corpus, 20 merges)") {
    import spark.implicits._
    // textbook trace (same as bpeTrain's)
    val corpus = Seq(
      ("low " * 5).trim, ("lower " * 2).trim,
      ("newest " * 6).trim, ("widest " * 3).trim).toDF("text")
    val localTb = graft.ext.TextAnalysis.bpeTrainLocal(corpus, "text", merges = 4)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    localTb shouldBe Array(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L))
    // full equality with the distributed path on a real corpus — every
    // round's (pair, freq), tie-breaks included
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def trace(df: org.apache.spark.sql.DataFrame) = df.orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    trace(graft.ext.TextAnalysis.bpeTrainLocal(docs, "text", merges = 20)) shouldBe
      trace(graft.ext.TextAnalysis.bpeTrain(docs, "text", merges = 20))
    // exhaustion parity: a corpus that runs dry stops at the same round
    val tiny = Seq("aaa").toDF("text")
    trace(graft.ext.TextAnalysis.bpeTrainLocal(tiny, "text", merges = 10)) shouldBe
      trace(graft.ext.TextAnalysis.bpeTrain(tiny, "text", merges = 10))
  }

  test("bpeTrainLocal: vocab cap fails loud") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma delta").toDF("text")
    val e = intercept[IllegalArgumentException] {
      graft.ext.TextAnalysis.bpeTrainLocal(docs, "text", merges = 2, maxVocab = 2)
    }
    e.getMessage should include("maxVocab")
  }

  test("bpeEncode: textbook rules encode lowest -> [low, est]; OOV chars survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rules = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = graft.ext.TextAnalysis.bpeEncode(
        Seq("lowest low xyz").toDF("text"), "text", rules)
      .select(col("subwords")).as[Seq[String]].head()
    // "lowest": es -> est -> lo -> low gives [low, est]; "low" -> [low];
    // "xyz" has no rules -> char symbols survive
    got shouldBe Seq("low", "est", "low", "x", "y", "z")
  }

  test("bpeEncodeMarked/detokenize: round trip = single-space normalization; " +
      "marked and flat encodes segment identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rules = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val docs = Seq(
      (1L, "lowest low xyz"),
      (2L, "Low  DOUBLE   spaced"), // case folds, runs collapse
      (3L, "single"),
      (4L, ""),                     // empty doc -> empty decode
      (5L, " leading and trailing ")
    ).toDF("doc_id", "text")
    val marked = graft.ext.TextAnalysis.bpeEncodeMarked(docs, "text", rules)
    // the marker rides the word-final piece only
    marked.filter($"doc_id" === 1L)
      .select($"subwords_marked").as[Seq[String]].head() shouldBe
      Seq("low", "est</w>", "low</w>", "x", "y", "z</w>")
    // round trip: decode(encode(x)) == lower(x) with space runs and
    // edge spaces collapsed — the face's oracle-side normalization
    val got = marked.select($"doc_id",
        graft.ext.TextAnalysis.detokenize($"subwords_marked").as("d"))
      .orderBy("doc_id").as[(Long, String)].collect()
    got shouldBe Array(
      (1L, "lowest low xyz"), (2L, "low double spaced"),
      (3L, "single"), (4L, ""), (5L, "leading and trailing"))
    // identical segmentation: piece counts match the flat encode
    val counts = graft.ext.TextAnalysis.bpeEncode(docs, "text", rules)
      .select($"doc_id",
        org.apache.spark.sql.functions.size($"subwords").as("flat"))
      .join(marked.select($"doc_id",
        org.apache.spark.sql.functions.size($"subwords_marked").as("mk")),
        Seq("doc_id"))
    counts.filter($"flat" =!= $"mk").count() shouldBe 0L
  }

  test("marker escape: a literal </w> in the text round-trips through " +
      "BOTH marked encodes (escape at encode, restore at decode)") {
    import spark.implicits._
    val rules = Seq(("e", "s"), ("l", "o"))
    val docs = Seq(
      (1L, "x</w>y plain"),          // marker mid-word
      (2L, "end</w> </w>start"),     // word-final and word-initial
      (3L, "</w>"),                  // the marker alone as a word
      (4L, "no marker here")
    ).toDF("doc_id", "text")
    val viaBpe = graft.ext.TextAnalysis.bpeEncodeMarked(docs, "text", rules)
      .select($"doc_id",
        graft.ext.TextAnalysis.detokenize($"subwords_marked").as("d"))
      .orderBy("doc_id").as[(Long, String)].collect()
    viaBpe shouldBe Array((1L, "x</w>y plain"), (2L, "end</w> </w>start"),
      (3L, "</w>"), (4L, "no marker here"))
    val pieces = Seq(("a", -0.5), ("b", -0.7), ("c", -0.9))
    // a SINGLE-character marker escapes to a bare NUL (an interior
    // splice would still contain the marker and be destroyed by the
    // marker→space replace) — the round trip must hold there too
    val via1 = graft.ext.TextAnalysis.bpeEncodeMarked(
        Seq((1L, "a#b plain# #tail")).toDF("doc_id", "text"),
        "text", rules, marker = "#")
      .select(graft.ext.TextAnalysis
        .detokenize($"subwords_marked", marker = "#").as("d"))
      .as[String].head()
    via1 shouldBe "a#b plain# #tail"
    val viaUni = graft.ext.UnigramTok.unigramEncodeMarked(
        docs, "text", pieces ++ Seq(("x", -1.0), ("y", -1.0), ("z", -1.0),
          ("<", -2.0), ("/", -2.0), ("w", -2.0), (">", -2.0), (" ", -3.0),
          ("e", -1.0), ("n", -1.0), ("d", -1.0), ("s", -1.0), ("t", -1.0),
          ("r", -1.0), ("p", -1.0), ("l", -1.0), ("i", -1.0), ("o", -1.0),
          ("m", -1.0), ("k", -1.0), ("h", -1.0)))
      .select($"doc_id",
        graft.ext.TextAnalysis.detokenize($"pieces_marked").as("d"))
      .orderBy("doc_id").as[(Long, String)].collect()
    viaUni shouldBe viaBpe
  }

  test("byte-fallback ids: emoji/CJK/accents round-trip exactly, zero unk, " +
      "in-vocab ASCII words never fall back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = graft.ext.TextAnalysis
    val rules = Seq(("l", "o"), ("lo", "w"))
    val corpus = Seq((1L, "low lower lowest plain words here"))
      .toDF("doc_id", "text")
    val vocab = t.buildBpeVocab(corpus, "text", rules, 64)
    vocab.map(_._2).min should be >= t.VocabIdBase
    val docs = Seq(
      (1L, "low words café 東京 🌍 emoji😀mix"),
      (2L, "plain here"),            // fully in-vocab: no byte ids
      (3L, ""),                      // empty → empty
      (4L, "😀😀 naïve")
    ).toDF("doc_id", "text")
    val enc = docs.select($"doc_id",
      t.encodeIdsByteFallback($"text", rules, vocab).as("ids"))
    val out = enc.select($"doc_id",
        t.decodeIdsByteFallback($"ids", vocab).as("decoded"),
        org.apache.spark.sql.functions.size(
          filter($"ids", i => i === 0)).as("n_unk"),
        org.apache.spark.sql.functions.size(
          filter($"ids", i => i >= 1 && i <= 256)).as("n_byte"))
      .orderBy("doc_id").collect()
    // exact round trip (normalization only), zero unk everywhere
    out.map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
      (1L, "low words café 東京 🌍 emoji😀mix"),
      (2L, "plain here"), (3L, ""), (4L, "😀😀 naïve"))
    out.foreach(_.getInt(2) shouldBe 0)
    // fallback fires exactly where needed: doc 2 is fully in-vocab
    out(0).getInt(3) should be > 0
    out(1).getInt(3) shouldBe 0
    out(3).getInt(3) should be > 0
    // id-space discipline: every id is byte, EOW, or vocab — and the
    // vocab ids used actually decode through the reverse map
    val allIds = enc.select(explode($"ids").as("i")).distinct()
      .collect().map(_.getInt(0)).toSet
    allIds.foreach { i =>
      assert((i >= 1 && i <= 256) || i == t.EowId || i >= t.VocabIdBase,
        s"id $i outside the byte/eow/vocab space")
    }
    // out-of-space ids in a foreign stream fail LOUD, never decode to
    // plausible-looking corrupted text: the reserved unk 0, a NEGATIVE
    // id (would lpad-truncate its two's-complement hex into a fake
    // byte), and an UNMAPPED high id (element_at's null would silently
    // blank the whole decode)
    Seq(Seq(0), Seq(-5), Seq(Int.MaxValue)).foreach { bad =>
      val ex = intercept[Exception] {
        Seq(bad).toDF("ids")
          .select(t.decodeIdsByteFallback($"ids", vocab)).collect()
      }
      ex.getMessage should (include(s"id ${bad.head}") and
        include("decodeIdsByteFallback"))
    }
    // a byte-id run that is NOT valid UTF-8 (a lone continuation byte
    // here) fails loud with the same MALFORMED_CHARACTER_CODING
    // surface Spark 4's decode expression raised in the HOF form —
    // never a silent U+FFFD (ADVICE r18). byte b is id b+1.
    val badUtf8 = intercept[Exception] {
      Seq(Seq(0x80 + 1, t.EowId)).toDF("ids")
        .select(t.decodeIdsByteFallback($"ids", vocab)).collect()
    }
    badUtf8.getMessage should include("MALFORMED_CHARACTER_CODING")
  }

  test("unigram byte-fallback ids: same id space, same decode, Viterbi " +
      "segmentation; piece-table vocab covers every trained piece") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t = graft.ext.TextAnalysis
    val corpus = Seq((1L, "low lower lowest plain words here"))
      .toDF("doc_id", "text")
    val pieces = graft.ext.UnigramTok.unigramTrain(corpus, "text",
        vocabSize = 20)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSeq
    val vocab = t.unigramIdVocab(pieces)
    vocab.map(_._2).min shouldBe t.VocabIdBase // rank 1 → first free id
    val docs = Seq(
      (1L, "low plain café 東京"),
      (2L, "lower here")
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        t.unigramEncodeIdsByteFallback($"text", pieces, vocab).as("ids"))
      .select($"doc_id",
        t.decodeIdsByteFallback($"ids", vocab).as("decoded"),
        org.apache.spark.sql.functions.size(
          filter($"ids", i => i === 0)).as("n_unk"),
        org.apache.spark.sql.functions.size(
          filter($"ids", i => i >= 1 && i <= 256)).as("n_byte"))
      .orderBy("doc_id").collect()
    out.map(r => (r.getLong(0), r.getString(1))) shouldBe Array(
      (1L, "low plain café 東京"), (2L, "lower here"))
    out.foreach(_.getInt(2) shouldBe 0)
    out(0).getInt(3) should be > 0  // non-ASCII words fell back
    out(1).getInt(3) shouldBe 0     // trained words ride piece ids
  }

  test("bpeEncode replays training exactly on the training corpus") {
    import org.apache.spark.sql.functions._
    // encode(training corpus) under the learned rules must equal the
    // final training vocab state: same greedy application semantics
    val corpus = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val rules = graft.ext.TextAnalysis.bpeTrain(corpus, "text", merges = 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // spot-check: every emitted subword is either a learned merge
    // product or a single character
    val merged = rules.map { case (l, r) => l + r }.toSet
    val subs = graft.ext.TextAnalysis.bpeEncode(corpus, "text", rules)
      .select(explode(col("subwords")).as("s")).distinct()
      .collect().map(_.getString(0))
    subs.foreach { s =>
      assert(s.length == 1 || merged.contains(s),
        s"subword '$s' is neither a char nor a learned merge")
    }
  }

  test("bpePairs: adjacent pairs counted, case-folded, ties broken by pair; short docs skipped") {
    val df = Seq(
      "The cat sat",     // "the cat", "cat sat"
      "the cat ran",     // "the cat", "cat ran"
      "cat",             // 1 token -> no pairs
      "dog ran"          // "dog ran"
    ).toDF("text")
    val out = TextAnalysis.bpePairs(df, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    out shouldBe List(("the cat", 2L), ("cat ran", 1L), ("cat sat", 1L))
  }

  test("zipfHead: rank by freq then term, cumulative share over corpus total") {
    // tokens: a×4, b×2, c×1, d×1 — total 8
    val df = Seq("a a b", "a b c", "A d").toDF("text")
    val out = TextAnalysis.zipfHead(df, "text", topK = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toList
    out shouldBe List(
      (1, "a", 4L, 0.5),       // 4/8
      (2, "b", 2L, 0.75),      // 6/8
      (3, "c", 1L, 0.875))     // 7/8 — "d" loses the tie, truncated
  }

  test("corpusDiversity: entropy of closed lang set, exact decimal TTR sum") {
    val df = Seq(
      ("s1", "en", "a a b"),   // ttr 2/3 → 0.666667
      ("s1", "en", "x y"),     // ttr 1.0
      ("s1", "de", "k"), ("s1", "de", "m"),
      ("s2", "en", "q q")      // ttr 0.5
    ).toDF("source", "lang", "text")
    val out = TextAnalysis.corpusDiversity(df, "source", "lang", "text",
        Seq("de", "en", "es", "fr", "zh"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"),
          r.getAs[Long]("sum_nd"), r.getAs[Long]("sum_nt"),
          r.getAs[java.math.BigDecimal]("sum_ttr").doubleValue,
          r.getAs[Double]("lang_entropy"),
          r.getAs[Long]("c_en"), r.getAs[Long]("c_de")))).toMap
    val (n1, nd1, nt1, ttr1, h1, en1, de1) = out("s1")
    n1 shouldBe 4L
    // exact integer TTR inputs — these ARE the driver-hashed surface
    (nd1, nt1) shouldBe ((2L + 2L + 1L + 1L, 3L + 2L + 1L + 1L))
    // sum_ttr / lang_entropy goldens (SURVEY §5): the float columns
    // are pinned here, not on the cross-engine oracle hash
    ttr1 shouldBe (0.666667 + 1.0 + 1.0 + 1.0 +- 1e-9)
    h1 shouldBe (math.log(2.0) +- 1e-6) // uniform 2-of-4 / 2-of-4 split
    (en1, de1) shouldBe ((2L, 2L))      // the exact gated entropy inputs
    val (n2, nd2, nt2, ttr2, h2, en2, de2) = out("s2")
    (n2, nd2, nt2, ttr2, h2, en2, de2) shouldBe ((1L, 1L, 2L, 0.5, 0.0, 1L, 0L)) // single lang → entropy 0
  }

  test("bm25Rank: multi-term sums per-term scores; topK truncates") {
    val df = Seq((1L, "x y"), (2L, "x x"), (3L, "y"), (4L, "z"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.bm25Rank(df, "doc_id", "text", Seq("x", "y"), topK = 2)
    one.count() shouldBe 2L
    // doc 1 has both terms — it must outrank the single-term docs
    one.collect().head.getLong(0) shouldBe 1L
  }

  test("unigramLogProb: hand-checked probabilities; common prose beats rare soup") {
    // corpus tokens: a a a b → p(a)=3/4, p(b)=1/4
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_c"),
          r.getAs[Long]("min_c"), r.getAs[Double]("logprob_avg")))).toMap
    // logprob goldens (SURVEY §5): the libm-sensitive score is pinned
    // here; the cross-engine oracle gates only the exact columns
    out(1L) shouldBe ((3L, 9L, 3L, out(1L)._4))
    out(1L)._4 shouldBe (math.log10(0.75) +- 1e-5)
    out(2L) shouldBe ((1L, 1L, 1L, out(2L)._4))
    out(2L)._4 shouldBe (math.log10(0.25) +- 1e-5)

    // a doc of corpus-common tokens scores above one of singletons
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (99L, "zxq qvw jjk pqr")
    val scored = TextAnalysis.unigramLogProb(corpus.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("logprob_avg")).toMap
    scored(1L) should be > scored(99L)
  }

  test("unigramLogProb: layout-independent (exact decimal sums)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect().toSeq
    val b = TextAnalysis.unigramLogProb(docs.repartition(13), "doc_id", "text")
      .orderBy("id").collect().toSeq
    a shouldBe b
  }

  test("buildVocab + encodeTokens: freq-desc ids, deterministic ties, OOV → 0") {
    val df = Seq("a b a c", "a d").toDF("text")
    // freq: a=3; b,c,d tie at 1 → token-asc tie-break picks b
    val vocab = TextAnalysis.buildVocab(df, "text", 2)
    vocab shouldBe Seq("a" -> 1, "b" -> 2)
    val ids = df.select(TextAnalysis.encodeTokens(col("text"), vocab).as("ids"))
      .collect().map(_.getSeq[Int](0))
    ids(0) shouldBe Seq(1, 2, 1, 0)
    ids(1) shouldBe Seq(1, 0)
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.buildVocab(df, "text", 0) // unbounded collect refused
  }

  test("pmiCollocations: hand-checked PMI, minCount suppresses hapax pairs") {
    val docs = Seq(
      "New York new york is big",
      "new york has a big apple").toDF("text")
    // case-folded tokens: n_tok=12, bigrams n_pairs=10;
    // (new,york) c_pair=3, c(new)=3, c(york)=3
    // pmi = ln((3/10) / ((3/12)*(3/12))) = ln(4.8)
    val top = TextAnalysis.pmiCollocations(docs, "text", minCount = 2, topK = 10)
      .collect()
    top.length shouldBe 1 // every other pair is hapax → suppressed
    val r = top.head
    r.getAs[Int]("rank") shouldBe 1
    r.getAs[String]("l") shouldBe "new"
    r.getAs[String]("r") shouldBe "york"
    r.getAs[Long]("c_pair") shouldBe 3L
    r.getAs[Long]("c_l") shouldBe 3L
    r.getAs[Long]("c_r") shouldBe 3L
    r.getAs[Double]("pmi") shouldBe (math.log(4.8) * 1e6).round / 1e6
  }

  test("bigramLogProb: hand-checked conditional log-probs; short docs dropped") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    // bg counts: (a,b)=3, (b,a)=1, (b,c)=1; c(a)=3, c(b)=3
    // lp(a,b)=log10(3/3)=0; lp(b,a)=lp(b,c)=round(log10(1/3),6)=-0.477121
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect()
    out.length shouldBe 2 // doc 3 has no bigrams
    val d1 = out(0)
    d1.getAs[Long]("n_bigrams") shouldBe 3L
    d1.getAs[Long]("sum_c2") shouldBe 7L // 3+1+3
    d1.getAs[Long]("min_c2") shouldBe 1L
    d1.getAs[Double]("logprob_avg") shouldBe -0.15904 // -0.477121/3 rounded
    val d2 = out(1)
    d2.getAs[Long]("n_bigrams") shouldBe 2L
    d2.getAs[Long]("sum_c2") shouldBe 4L // 3+1
    d2.getAs[java.math.BigDecimal]("sum_lp").doubleValue() shouldBe -0.477121
  }

  test("bigramLogProb: layout-independent (exact decimal sums)") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 5} end"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect().toSeq
    val b = TextAnalysis.bigramLogProb(docs.repartition(13), "doc_id", "text")
      .orderBy("id").collect().toSeq
    a shouldBe b
  }
}
