package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization, language ID, quality scoring,
  * document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` higher-order array
  * expressions — no UDFs — so the operators scale as plain projections:
  * no shuffle, no driver involvement, embarrassingly parallel over
  * whatever partitioning the scan produced.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit base hash of a token/shingle: first 15 hex digits of md5,
    * as int64 (same formula the DuckDB oracle can compute:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`).
    */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: alpha runs, single digits, and
    * punctuation each count as one token (a crude proxy for a BPE
    * vocabulary's behavior on unseen text). Computed by a codegen'd
    * byte-walk, value-identical to
    * `regexp_count(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')`
    * (PropertySpec) but without the regex engine.
    */
  def tokenCountBpe(text: Column): Column =
    // int, like the regexp_count it replaced — q_token_stats' schema
    graft.functions.TextStatsFunctions.bpe_token_count(text).cast("int")

  private[ext] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  private[ext] def inList(t: Column, words: Seq[String]): Column =
    words.map(w => t === w).reduce(_ || _)

  /** Fraction of whitespace tokens that are stopwords. Counts come
    * from the one-pass [[graft.functions.LangScore]] walk (same
    * `split(text, " ")` semantics; equivalence spec-pinned) — the
    * `size(filter(...))` lambda form it replaces was interpreted,
    * re-evaluated per consumer, and materialized the split array.
    */
  def stopwordRatio(text: Column): Column = {
    val st = graft.functions.LangScoreFunctions.scored_text(text)
    st.getField("stop_cnt").cast("double") /
      greatest(st.getField("n_tokens"), lit(1)).cast("double")
  }

  /** Fraction of characters that are punctuation/symbols. The count
    * is a codegen'd byte-walk, value-identical to
    * `regexp_count(text, '[^a-zA-Z0-9\s]')` (PropertySpec) — the
    * regex engine cost ~2 ms of core time per KB-document, which made
    * this the single most expensive row-local gate in the corpus-prep
    * pipeline.
    */
  def punctRatio(text: Column): Column =
    graft.functions.TextStatsFunctions.non_alnum_count(text).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column =
    (length(text) - (tokenCountWs(text) - 1)).cast("double") /
      greatest(tokenCountWs(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]-ish: long enough, low punct,
    * some-but-not-all stopwords. Heuristic weights; the point is the
    * shape (pure per-row projection). Served from the one-pass
    * [[graft.functions.LangScore]] walk, which replays the exact
    * Catalyst double-op sequence
    * `round(0.5*least(len/500, 1) + 0.25*(1 - punct) +
    * 0.25*least(stop*5, 1), 6)` (equivalence spec-pinned; the q_quality
    * oracle hashes the values).
    */
  def qualityScore(text: Column): Column =
    graft.functions.LangScoreFunctions.scored_text(text).getField("quality")

  /** Marker-word lists for the n-gram-heuristic language ID. Shared
    * with the oracle SQL generator in
    * [[graft.queries.ExtQueries]].
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  /** Heuristic language ID: count marker-word hits per language, take
    * the argmax (first language in [[langMarkers]] order wins ties —
    * deterministic). Emits one score column per language plus
    * `lang_pred`. All columns are fields of ONE
    * [[graft.functions.ScoredTextExpr]] evaluation — the previous
    * per-language `size(filter(split(...)))` lambdas were interpreted
    * and re-evaluated inside every `greatest`/CASE operand after
    * filter pushdown (up to ~30 split+filter array materializations
    * per row in the corpus_prepare gate).
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val st = graft.functions.LangScoreFunctions.scored_text(col(textCol))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, _)) =>
      d.withColumn(s"score_$lang", st.getField(s"score_$lang"))
    }
    scored.withColumn("lang_pred", st.getField("lang_pred"))
  }

  /** Canonical text normalization for dedup keys: lowercase, strip
    * everything but letters/digits/spaces, collapse whitespace runs,
    * trim. Pure codegen'd projection; normalizing before hashing is
    * what turns "exact" dedup into case/punctuation-insensitive dedup.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** TF-IDF top terms per document — the retrieval/quality-analysis
    * staple (what characterizes this document against the corpus).
    * tf = in-document term count; idf = ln((N+1)/(df+1)) + 1 (the
    * smoothed form, never negative); score = tf·idf; top `k` terms per
    * doc by (score desc, term asc) — a total tie-break, so the result
    * is deterministic and oracle-checkable.
    *
    * Scale shape: ONE scan — explode → per-(doc, term) count (map-side
    * combinable), then df via `count() OVER (PARTITION BY term)` on
    * that aggregate (tf has exactly one row per (doc, term), so the
    * partition count IS the document frequency). The window replaces
    * the naive second scan + second aggregation + join — and makes no
    * small-vocabulary broadcast assumption, which matters when the
    * long-tail vocabulary of a 100 TB corpus is itself huge. `nDocs`
    * rides in as a driver literal from one cheap count agg — the same
    * deliberate two-job constant-fold as the reference's quantile
    * thresholds (ETL_pipeline.py:113-123).
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.select(col(idCol)).agg(count(lit(1))).head().getLong(0)
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("score", col("tf") *
        (log((lit(nDocs) + 1.0) / (col("df") + lit(1.0))) + lit(1.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** CCNet-style unigram language-model quality score: per document,
    * the mean log10 probability of its whitespace tokens under the
    * corpus' OWN unigram distribution — the classic "fluent prose vs
    * rare-token soup" quality axis (a low mean logprob marks
    * gibberish, boilerplate code, and mojibake without shipping an
    * external LM). Self-scored: the vocabulary is one count
    * aggregation over the exploded tokens; each DISTINCT token's
    * logprob is computed once there and rounded to DECIMAL(18,6), so
    * the per-document sums are EXACT decimal aggregations —
    * commutative and layout-independent, where summing raw double
    * logs would drift with partitioning (same discipline as
    * [[graft.ops.Stats]]' moment sums).
    *
    * Scale: explode → vocab agg (map-side combinable, one shuffle on
    * the term) → token⋈vocab equi-join (term-partitioned) → per-doc
    * agg (second shuffle, on id). The corpus total rides a one-row
    * broadcast (the ship-the-quantizer shape, like BM25's stats).
    * Terms travel as strings for oracle parity; at corpus scale the
    * join currency swaps to [[tokenHash60]] like the dedup family.
    *
    * Besides the score itself the output carries EXACT integer
    * surrogates of the LM inputs — `sum_c` (summed corpus frequency
    * of the doc's tokens) and `min_c` (its rarest token's count).
    * These are what the cross-engine oracle gates: `log10` is the one
    * op whose last ulp differs between libm builds, and rounding it
    * per-term before a sum amplifies any boundary hit across every
    * document containing that term (observed driver-red in rounds
    * 3–5). The transcendental columns are pinned by ScalaTest goldens
    * instead (TextAnalysisSpec), per the SURVEY §5 rule.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("n_total"))
    val vlp = vocab.crossJoin(broadcast(total))
      .select(col("term"), col("c"),
        round(log10(col("c").cast("double") / col("n_total")), 6)
          .cast("decimal(18,6)").as("lp"))
    toks.join(vlp, Seq("term"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("c").as("sum_c"), min("c").as("min_c"),
        sum("lp").as("sum_lp"))
      .withColumn("logprob_avg",
        round(col("sum_lp").cast("double") / col("n_tokens"), 6))
  }

  /** Shared scoring half of the CCNet bucketing faces: `lang_pred`
    * (marker-word [[langId]]) plus an exact-integer fluency statistic
    * per document — Σ round(ln(corpus-freq of token) · 10⁶) as a
    * BIGINT of micro-nats. This is the unigram-LM perplexity ordering
    * (perplexity = exp(ln N − Σ ln c / n); the ln N shift is constant
    * per corpus, so ordering by Σ ln c / n IS ordering by perplexity,
    * inverted) carried in integers: the per-token `round(ln(c)·1e6)`
    * is one identical IEEE op sequence on Spark and DuckDB (the
    * q_pmi ln precedent), and from there every aggregate is exact
    * BIGINT arithmetic — no order-dependent double sums anywhere.
    */
  def ccnetFluency(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lid = langId(df, textCol)
      .select(col(idCol).as("id"), col("lang_pred"))
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val vlp = vocab.select(col("term"),
      round(log(col("c").cast("double")) * lit(1000000.0))
        .cast("long").as("lp_micro"))
    toks.join(vlp, Seq("term"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum("lp_micro").as("lp_sum_micro"))
      .join(lid, Seq("id"))
      // exact-input division: both operands integers < 2^53, so the
      // double is the same bit pattern on any engine
      .withColumn("fluency",
        col("lp_sum_micro").cast("double") / col("n_tok"))
  }

  /** CCNet-style per-language perplexity bucketing (Wenzek et al.
    * 2020): split each language's documents into head/middle/tail
    * TERCILES by LM fluency — head = the most fluent (lowest
    * perplexity) third, the slice CCNet keeps for training. Terciles
    * are `ntile(3)` over (fluency desc, id) per language — rank-based
    * and total-ordered, so the bucketing replays exactly.
    *
    * Scale note: the window sorts each language's documents in full —
    * fine to ~10⁸ docs/language, but a skewed corpus (one dominant
    * language at 100 TB) serializes that language's sort. The scale
    * path is [[ccnetBucketsThresh]]: per-language tercile CUTS (a
    * G-row aggregate) broadcast back, bucket assignment row-local.
    */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang_pred")
      .orderBy(col("fluency").desc, col("id"))
    ccnetFluency(df, idCol, textCol)
      .withColumn("tercile", ntile(3).over(w))
      .withColumn("bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail"))
      .select("id", "lang_pred", "n_tok", "lp_sum_micro", "bucket")
  }

  /** Threshold-based CCNet bucketing — the 100 TB path: per-language
    * tercile cuts via EXACT percentile (a #languages-row aggregate),
    * broadcast back, bucket = two row-local comparisons. No
    * per-language sort of the corpus; the only corpus-sized shuffles
    * are the vocab join and the per-doc aggregation that
    * [[ccnetFluency]] already pays. Bucket EDGES differ from
    * [[ccnetBuckets]]' rank terciles only at interpolated boundaries
    * (ntile is count-based; quantile interpolates) — both are valid
    * CCNet splits; this face's oracle replays its own semantics
    * exactly.
    */
  def ccnetBucketsThresh(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    ccnetBucketsWithCuts(df, idCol, textCol,
      ccnetCuts(df, idCol, textCol))

  /** The per-language tercile CUTS alone — the calibration artifact
    * ([[graft.io.IndexStore]] persists it): a #languages-row frame of
    * exact percentiles over the fluency scores.
    */
  def ccnetCuts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ccnetFluency(df, idCol, textCol).groupBy("lang_pred").agg(
      expr(s"percentile(fluency, ${1.0 / 3})").as("t_lo"),
      expr(s"percentile(fluency, ${2.0 / 3})").as("t_hi"))

  /** Bucket under SUPPLIED cuts — the serve half: score the corpus,
    * broadcast the (tiny) cut table, two row-local compares. What a
    * nightly-calibrated gate runs against fresh data.
    */
  def ccnetBucketsWithCuts(df: DataFrame, idCol: String,
      textCol: String, cuts: DataFrame): DataFrame =
    ccnetFluency(df, idCol, textCol)
      .join(broadcast(cuts), Seq("lang_pred"))
      .withColumn("bucket",
        when(col("fluency") >= col("t_hi"), "head")
          .when(col("fluency") >= col("t_lo"), "middle")
          .otherwise("tail"))
      .select("id", "lang_pred", "n_tok", "lp_sum_micro", "bucket")

  /** Adjacent-token pair frequencies — the statistic a BPE/WordPiece
    * tokenizer trainer computes every merge round (which symbol pair
    * is most frequent?). Pairs are built ROW-LOCALLY with `zip_with`
    * over two shifted slices of the token array (no posexplode +
    * self-join on position), so the only shuffle is the pair-count
    * aggregation, which is map-side combinable: hot pairs ("of the")
    * collapse to one partial row per task before they travel. The
    * global top-k is `orderBy().limit(k)` — a distributed
    * TakeOrdered, not a single-partition sort.
    *
    * Scale: explode emits one row per adjacent pair (≈ token count),
    * the same volume TF-IDF's explode carries; at 100 TB the pair
    * strings would swap to [[tokenHash60]] pairs with a small
    * hash→string lookup for the final k rows.
    */
  /** BPE tokenizer TRAINING: learn `merges` merge rules from the
    * corpus (the full loop [[bpePairs]] is one round of). Returns the
    * learned merge table (round, left, right, freq) in training
    * order — the "train offline, ship it" artifact a production
    * tokenizer pipeline produces.
    *
    * Scale shape — the reason this trains on 100 TB at all: the
    * corpus is scanned EXACTLY ONCE, into the word-frequency
    * vocabulary (one map-side-combinable groupBy; web-scale corpora
    * have ~10⁷–10⁸ distinct words — executor-sized, orders of
    * magnitude under the corpus). Every training round then runs
    * over that compressed vocabulary: one pair-frequency aggregation
    * (zip_with over shifted symbol slices, weighted by word freq) +
    * one argmax collect (a single row per round — the only
    * driver-side data), and one row-local
    * [[graft.functions.BpeFunctions.bpe_merge]] rewrite. Ties break
    * (freq desc, left asc, right asc), so training is deterministic
    * on any layout.
    *
    * Classic character-BPE with no end-of-word marker (symbols start
    * as the word's characters; merges never cross word boundaries).
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    import graft.functions.BpeFunctions.bpe_merge
    val spark = df.sparkSession
    // localCheckpoint, not cache: each round rebuilds `sym` from the
    // previous round's, and downstream consumers reference the column
    // several times (two slices + two sizes), so the LOGICAL plan
    // grows ~4× per round — by round 20 a cached-lineage formulation
    // OOM'd the driver just STRINGIFYING the tree (measured; cache
    // shortcuts execution but never truncates lineage). Checkpointing
    // pins the round's vocab as executor blocks and restarts the plan
    // from a scan — iterative training's equivalent of the GraphX
    // lineage-truncation discipline.
    var vocab = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(filter(split(col("w"), ""), s => length(s) > 0).as("sym"),
        col("freq"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val pairs = vocab
        .filter(size(col("sym")) >= 2)
        .select(explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (pairs.head.getString(0), pairs.head.getString(1),
          pairs.head.getLong(2))
        rules += ((round, l, r, cnt))
        vocab = vocab
          .select(bpe_merge(col("sym"), l, r).as("sym"), col("freq"))
          .localCheckpoint()
        round += 1
      }
    }
    import spark.implicits._
    rules.toSeq.toDF("round", "left", "right", "freq")
  }

  /** Driver-local BPE training fast path — bit-identical to
    * [[bpeTrain]] (same tokenization, same pair counting including
    * overlaps, same (freq desc, pair asc-by-UTF-8-bytes) tie-break,
    * same left-to-right non-overlapping merge rewrite), but the merge
    * LOOP runs on the driver over the collected word-frequency
    * vocabulary instead of as 2 Spark jobs per round.
    *
    * Why this exists: [[bpeTrain]]'s per-round cost is driver
    * SCHEDULING, not data — a production 32k–64k-merge tokenizer is
    * ~10⁵ driver-scheduled jobs regardless of corpus size. But the
    * corpus only matters for the ONE-scan word-freq aggregation
    * (web-scale corpora have ~10⁷–10⁸ distinct words — executor- and
    * driver-sized); every round after that is vocabulary-local. So:
    * one Spark scan builds the vocab, a `require`-capped collect
    * ships it (the [[graft.ext.Dedup]] `localClusters` edge-cap
    * precedent), and the driver runs the classic incremental trainer —
    * pair counts maintained by delta (only words containing the merged
    * pair are touched, via an inverted pair→words index) with a
    * lazy-deletion max-heap for the argmax (stale entries are popped
    * and dropped when their count no longer matches; any entry whose
    * count matches the CURRENT count is a valid maximum). 8k merges
    * at sf0.1 run in seconds (SCALE.md §BPE) vs days of scheduler
    * overhead extrapolated for the job-per-round loop.
    *
    * The UTF-8-byte pair comparison matches Spark's `StringType`
    * ordering (UTF8String binary compare), so tie-breaks agree with
    * [[bpeTrain]] beyond ASCII; equality of the two paths is pinned in
    * TextAnalysisSpec and both registry faces share one golden oracle.
    */
  def bpeTrainLocal(df: DataFrame, textCol: String, merges: Int,
      maxVocab: Int = 1 << 22): DataFrame = {
    import scala.collection.mutable
    val spark = df.sparkSession
    val vocabDf = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // count-then-collect (the nbWeightsMicro discipline): fail loud
    // before shipping an over-cap vocabulary to the driver
    val nVocab = vocabDf.count()
    require(nVocab <= maxVocab,
      s"bpeTrainLocal: vocabulary has $nVocab words > maxVocab=$maxVocab — " +
        "train on a sampled corpus or raise the cap deliberately")
    val rows = vocabDf.collect()

    // UTF-8 byte order == Spark StringType (UTF8String) order — NOT
    // java.lang.String's UTF-16 code-unit order, which disagrees for
    // supplementary characters
    def cmpUtf8(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var k = 0
      while (k < n) {
        val c = (x(k) & 0xff) - (y(k) & 0xff)
        if (c != 0) return c
        k += 1
      }
      x.length - y.length
    }

    val words = new Array[Array[String]](rows.length)
    val freqs = new Array[Long](rows.length)
    var i = 0
    while (i < rows.length) {
      // split("") = the distributed path's per-character symbol init
      words(i) = rows(i).getString(0).split("").filter(_.nonEmpty)
      freqs(i) = rows(i).getLong(1)
      i += 1
    }

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // inverted index: pair -> word ids that (at some point) contained
    // it; entries go stale after rewrites and are re-validated by
    // scanning the word before use
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    i = 0
    while (i < words.length) {
      val s = words(i); val f = freqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCount.update(p, pairCount.getOrElse(p, 0L) + f)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
      i += 1
    }

    // max-heap: highest count first, then smallest (l, r) — the exact
    // (cnt desc, l asc, r asc) argmax bpeTrain's orderBy computes
    val heapOrd: Ordering[(Long, String, String)] =
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val cl = cmpUtf8(b._2, a._2)
          if (cl != 0) cl else cmpUtf8(b._3, a._3)
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    pairCount.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }

    val rules = mutable.ListBuffer.empty[(Int, String, String, Long)]
    var round = 1
    while (round <= merges && {
      // pop stale entries until a live maximum (count matches current)
      var live: Option[(Long, String, String)] = None
      while (live.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCount.get((e._2, e._3)).contains(e._1)) live = Some(e)
      }
      live match {
        case None => false // no adjacent pairs left anywhere — exhausted
        case Some((cnt, l, r)) =>
          rules += ((round, l, r, cnt))
          val touched = mutable.HashSet.empty[(String, String)]
          val members = pairWords.remove((l, r)).getOrElse(mutable.HashSet.empty)
          members.foreach { idx =>
            val s = words(idx)
            var has = false; var j = 0
            while (!has && j < s.length - 1) {
              if (s(j) == l && s(j + 1) == r) has = true
              j += 1
            }
            if (has) {
              val f = freqs(idx)
              var k = 0
              while (k < s.length - 1) {
                val p = (s(k), s(k + 1))
                val c2 = pairCount(p) - f
                if (c2 == 0L) pairCount.remove(p) else pairCount.update(p, c2)
                touched += p
                k += 1
              }
              // BpeSupport.mergeStep's left-to-right non-overlapping pass
              val out = new mutable.ArrayBuffer[String](s.length)
              var m = 0
              while (m < s.length) {
                if (m + 1 < s.length && s(m) == l && s(m + 1) == r) {
                  out += (s(m) + s(m + 1)); m += 2
                } else { out += s(m); m += 1 }
              }
              val ns = out.toArray
              words(idx) = ns
              k = 0
              while (k < ns.length - 1) {
                val p = (ns(k), ns(k + 1))
                pairCount.update(p, pairCount.getOrElse(p, 0L) + f)
                pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += idx
                touched += p
                k += 1
              }
            }
          }
          // one fresh heap entry per touched pair at its final count —
          // pushing per word-update instead would bloat the heap
          touched.foreach { p =>
            pairCount.get(p).foreach(c2 => heap.enqueue((c2, p._1, p._2)))
          }
          round += 1
          true
      }
    }) {}
    import spark.implicits._
    rules.toSeq.toDF("round", "left", "right", "freq")
  }

  /** Encode the corpus with a trained merge table ([[bpeTrain]]'s
    * output, in round order): adds `subwords` — the standard
    * lowest-rank-first encode loop, row-local under one codegen'd
    * expression with the compiled rank map shipped once per plan.
    * Case-folds like training did.
    */
  def bpeEncode(df: DataFrame, textCol: String,
      rules: Seq[(String, String)]): DataFrame =
    df.withColumn("subwords",
      graft.functions.BpeFunctions.bpe_encode(lower(col(textCol)), rules))

  /** The ESCAPED form of a literal marker occurrence in raw text:
    * for a multi-character marker, its first character, a NUL, then
    * the rest — which can never CONTAIN the marker, so the
    * marker→space replace cannot touch it; a SINGLE-character marker
    * has no interior to split (any escaped form containing the
    * character would be destroyed by the first replace), so it maps
    * to a bare NUL. Restored by [[detokenize]] after the
    * marker→space replace. Escape-at-encode closes the round-trip
    * hazard a literal `</w>` in the corpus used to pose (decode
    * replaced every occurrence, spurious-spacing real content); the
    * residual precondition is only that raw text not contain the
    * NUL-bearing escaped sequence itself — a control-character
    * collision no natural corpus carries (documented, not checked) —
    * and markers must not themselves contain NUL (checked).
    */
  private[ext] def markerEscape(marker: String): String = {
    require(marker.nonEmpty && !marker.contains('\u0000'),
      "marker must be non-empty and NUL-free")
    if (marker.length >= 2) s"${marker.head}\u0000${marker.tail}"
    else "\u0000"
  }

  /** Escape literal marker occurrences in raw (lowered) text before a
    * marked encode — shared by the BPE and unigram marked encodes.
    * Literal `replace`, NOT `regexp_replace`: the marker is a fixed
    * string, and the regex engine's per-row Matcher walk measured
    * ~2× the whole encode on the no-marker common path (sf0.1 A/B,
    * round 18) where a plain UTF8String scan is near-free.
    */
  private[ext] def escapeMarker(text: Column, marker: String): Column =
    replace(text, lit(marker), lit(markerEscape(marker)))

  /** Word-boundary-MARKED BPE encode — the Sennrich `</w>` convention
    * a shipped tokenizer actually uses: each word's FINAL subword
    * carries the end-of-word marker, which is exactly the information
    * [[bpeEncode]]'s flat array discards and the one thing a
    * detokenizer needs. Same segmentation as [[bpeEncode]] (the merge
    * loop runs per word either way, so piece COUNT is identical for
    * marker-free text — spec-pinned; a word CARRYING a literal marker
    * is escaped first, see below, and may segment differently from
    * the flat encode of the unescaped text); built compositionally —
    * per-word `bpe_encode` inside a higher-order transform, no second
    * expression class — and empty words (consecutive spaces) drop
    * exactly as the flat encode drops them.
    *
    * Literal marker occurrences in the text are ESCAPED
    * ([[escapeMarker]] — a NUL spliced after the marker's first
    * character) so [[detokenize]] can restore them: the round-trip
    * invariant holds even for a corpus that quotes its own marker.
    */
  def bpeEncodeMarked(df: DataFrame, textCol: String,
      rules: Seq[(String, String)],
      marker: String = "</w>"): DataFrame =
    df.withColumn("subwords_marked",
      flatten(transform(
        filter(split(escapeMarker(lower(col(textCol)), marker), " ", -1),
          w => w =!= ""),
        w => {
          val g = graft.functions.BpeFunctions.bpe_encode(w, rules)
          concat(slice(g, lit(1), size(g) - 1),
            array(concat(element_at(g, -1), lit(marker))))
        })))

  /** Detokenize a MARKED subword stream back to normalized text —
    * pure built-ins (one array_join + two replaces), no custom
    * expression, TOKENIZER-AGNOSTIC (both the BPE and unigram marked
    * encodes ship the same end-of-word convention): the round-trip
    * contract is `detokenize(encodeMarked(x)) =
    * single-space-normalized lower(x)` (multiple spaces collapse
    * because empty words drop at encode — the only lossy step, and a
    * deliberate one). The QA faces this enables (q_bpe_roundtrip,
    * q_unigram_roundtrip, q_bpe_marker_roundtrip) need no tokenizer
    * replay in their oracles: if the invariant holds, the decode
    * EQUALS the SQL-side normalization of the raw text.
    *
    * A literal marker in the raw text survives the round trip: the
    * marked encodes escape it ([[escapeMarker]]), and this decode
    * restores it AFTER the marker→space replace (ordering matters —
    * escaped forms contain no marker, so the first replace cannot
    * touch them). Residual precondition: raw text must not contain
    * the NUL-bearing escaped sequence itself ([[markerEscape]]).
    */
  def detokenize(subwords: Column, marker: String = "</w>"): Column =
    replace(
      rtrim(replace(array_join(subwords, ""), lit(marker), lit(" "))),
      lit(markerEscape(marker)), lit(marker))

  /** PMI collocation mining: the top-k adjacent-token pairs by
    * pointwise mutual information, `pmi = ln(P(l,r) / (P(l)·P(r)))`
    * with `P(l,r) = c_pair/n_pairs` and `P(t) = c_t/n_tok` — the
    * statistic that surfaces multi-word expressions ("new york",
    * "machine learning") a tokenizer or phrase-merger should treat as
    * units. `minCount` suppresses the classic PMI pathology (a pair
    * seen once between two hapax tokens scores maximal PMI).
    *
    * Shape: bigrams are built ROW-LOCALLY ([[bpePairs]]' zip_with over
    * shifted slices — no positional self-join), so the corpus is
    * scanned twice (unigram + bigram counts, both map-side-combinable
    * aggregations) and everything after runs over the VOCABULARY:
    * pair→unigram joins are vocab-sized, the totals ride one-row
    * broadcasts (ship-the-stats, like BM25), and the top-k is a
    * distributed TakeOrdered with rank assigned over the k survivors
    * only. The `ln` argument is the identical IEEE op sequence in the
    * DuckDB oracle, so ordering and the rounded score replay exactly.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val ws = tokens(lower(col(textCol)))
    val uni = df.select(explode(ws).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c_t"))
    val pairsArr = when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("l"), b.as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    val pc = df.select(explode(pairsArr).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("c_pair"))
    // totals from the (small) count tables, not a third corpus scan
    val stats = uni.agg(sum("c_t").cast("double").as("n_tok"))
      .crossJoin(broadcast(pc.agg(sum("c_pair").cast("double").as("n_pairs"))))
    val scored = pc.filter(col("c_pair") >= minCount)
      .join(uni.select(col("term").as("l"), col("c_t").as("c_l")), Seq("l"))
      .join(uni.select(col("term").as("r"), col("c_t").as("c_r")), Seq("r"))
      .crossJoin(broadcast(stats))
      .select(col("l"), col("r"), col("c_pair"), col("c_l"), col("c_r"),
        log((col("c_pair").cast("double") / col("n_pairs")) /
          ((col("c_l").cast("double") / col("n_tok")) *
            (col("c_r").cast("double") / col("n_tok")))).as("pmi_raw"))
    val top = scored
      .orderBy(col("pmi_raw").desc, col("l").asc, col("r").asc)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_raw").desc, col("l").asc, col("r").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("l"), col("r"),
        col("c_pair"), col("c_l"), col("c_r"),
        round(col("pmi_raw"), 6).as("pmi"))
  }

  /** Bigram-LM document scoring — the CCNet-style "perplexity filter"
    * rung above [[unigramLogProb]]: each document is scored by the
    * average conditional log-probability of its adjacent-token pairs
    * under the corpus' own bigram model, `lp(l,r) = log10(c(l,r) /
    * c(l))`. Boilerplate and templated spam score near 0 (their
    * bigrams are corpus-frequent and near-deterministic); incoherent
    * token soup scores very negative — the filter keeps the middle.
    *
    * Same determinism discipline as [[unigramLogProb]]: per-bigram
    * log10 rounds to 6 decimals into DECIMAL(18,6) so the per-doc sum
    * is EXACT (order-independent across shuffle partitions), and the
    * cross-engine oracle gates the integer surfaces (`n_bigrams`,
    * `sum_c2`, `min_c2`) while the transcendental columns are pinned
    * by ScalaTest goldens.
    *
    * Shape: row-local bigram build (zip_with over shifted slices),
    * one vocab-sized bigram count, one unigram count, and a
    * bigram→doc re-join — the same two-explode volume TF-IDF carries;
    * at 100 TB the join currency swaps to [[tokenHash60]] pairs.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val pairsArr = when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("l"), b.as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    val bi = df.select(col(idCol).as("id"), explode(pairsArr).as("p"))
      .select(col("id"), col("p.l").as("l"), col("p.r").as("r"))
    val bg = bi.groupBy("l", "r").agg(count(lit(1)).as("c2"))
    val uni = df.select(explode(ws).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val cond = bg.join(uni.select(col("term").as("l"), col("c1")), Seq("l"))
      .select(col("l"), col("r"), col("c2"), col("c1"),
        round(log10(col("c2").cast("double") / col("c1")), 6)
          .cast("decimal(18,6)").as("lp"))
    bi.join(cond, Seq("l", "r"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("c2").as("sum_c2"), min("c2").as("min_c2"),
        sum("lp").as("sum_lp"))
      .withColumn("logprob_avg",
        round(col("sum_lp").cast("double") / col("n_bigrams"), 6))
  }

  def bpePairs(df: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    val ws = tokens(lower(col(textCol)))
    val pairs = when(size(ws) >= 2,
      zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array())
    df.select(explode(pairs).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
  }

  /** Zipf head: the corpus' top-k tokens with rank, frequency, and
    * cumulative frequency share — the rank-frequency profile used to
    * sanity-check a corpus against Zipf's law (a truncated or
    * boilerplate-heavy crawl shows up as a distorted head share).
    *
    * Shape: one explode → vocab count (map-side combinable), a
    * distributed TakeOrdered for the top-k, then rank + running share
    * over the K SURVIVING ROWS only (single-partition window over k
    * rows, not the vocabulary); the corpus token total rides a
    * one-row broadcast (ship-the-quantizer, like BM25's stats). The
    * share divides exact BIGINTs in double and rounds to 6 — the
    * cross-engine-stable discipline the other ratio queries use.
    */
  def zipfHead(df: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: the total and the head both derive from the vocab agg,
    // and without the cache each branch re-scans the corpus (vocab ≪
    // corpus, so this is the cheap side of that trade). The cache's
    // lifecycle is closed HERE: both consumers are eagerly
    // materialized via localCheckpoint (k rows + 1 row — trivial),
    // then the vocab is unpersisted, so repeated ad-hoc calls in a
    // long-lived session leak nothing.
    val vocab = df.select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .cache()
    val (total, head) =
      try {
        (vocab.agg(sum("freq").as("n_total")).localCheckpoint(true),
          vocab.orderBy(col("freq").desc, col("term").asc).limit(topK)
            .localCheckpoint(true))
      } finally vocab.unpersist()
    val w = Window.orderBy(col("freq").desc, col("term").asc)
    head.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_share",
        round(sum("freq").over(w).cast("double") / col("n_total"), 6))
      .select(col("rank"), col("term"), col("freq"), col("cum_share"))
  }

  /** Per-source corpus diversity: document count, summed type-token
    * ratio (distinct/total tokens per doc — kept as an EXACT
    * DECIMAL(18,6) sum; a decimal→double cast at scale 6 is the known
    * cross-engine 1-ulp hash hazard), and Shannon entropy of the
    * language distribution over a FIXED language set (closed-world
    * conditional counts — no distinct-values job, and the entropy sum
    * is a fixed left-assoc expression, never a float aggregation).
    * One map-side-combinable shuffle for everything.
    *
    * The per-language counts `c_<lang>` ride along in the output:
    * they ARE the entropy's inputs and are exact integers, so they
    * form the cross-engine oracle surface, while `lang_entropy`
    * itself (p·ln p at a 6-dp rounding boundary — the libm-ulp
    * hazard that kept this query driver-red rounds 3–5) is pinned by
    * a ScalaTest golden instead, per the SURVEY §5 rule.
    */
  def corpusDiversity(df: DataFrame, srcCol: String, langCol: String,
      textCol: String, langs: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    val ttr = round(size(array_distinct(toks)).cast("double") / size(toks), 6)
      .cast("decimal(18,6)")
    val langCounts = langs.map(l =>
      sum(when(col(langCol) === l, 1L).otherwise(0L)).as(s"c_$l"))
    val g = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        Seq(
          // sum_nd / sum_nt are the TTR's EXACT integer inputs — the
          // cross-engine oracle surface (the sum of per-doc rounded
          // doubles, sum_ttr, is the libm/round 1-ulp hazard that
          // redded the driver hash rounds 3-6; it stays in the output
          // for the API but is golden-pinned, never driver-hashed).
          sum(size(array_distinct(toks)).cast("long")).as("sum_nd"),
          sum(size(toks).cast("long")).as("sum_nt"),
          sum(ttr).as("sum_ttr")) ++ langCounts: _*)
    val nD = col("n_docs").cast("double")
    val entropy = langs.map { l =>
      val p = col(s"c_$l").cast("double") / nD
      when(col(s"c_$l") > 0, p * log(p)).otherwise(lit(0.0))
    }.reduce(_ + _)
    g.select(col(srcCol) +: col("n_docs") +: col("sum_nd") +:
      col("sum_nt") +: col("sum_ttr") +:
      langs.map(l => col(s"c_$l")) :+
      round(-entropy, 6).as("lang_entropy"): _*)
  }

  /** BM25 top-k retrieval for a fixed term set (Lucene-style
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf, so scores are always
    * positive). The query terms are compiled into per-term `tf_i`
    * columns (row-local `filter` counts — no explode, no per-term
    * passes), corpus stats (N, Σdl, df_i) come from ONE tiny aggregate
    * broadcast back, and the global top-k is an `orderBy().limit(k)`
    * — Spark plans that as a distributed TakeOrdered, NOT a
    * single-partition window. The score is a fixed left-assoc sum of
    * per-term scores (no float aggregation across rows), so the only
    * engine-sensitive op is `ln` itself — same exposure as
    * [[tfIdfTopTerms]], absorbed by round(…, 6) on both sides.
    *
    * Shape at scale: two corpus scans (stats + score), zero shuffles
    * of the corpus; the k-row result is the only thing that moves.
    */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topK: Int = 50,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val toks = tokens(col(textCol))
    val withTf = df.select(
      col(idCol).as("id") +: size(toks).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === t)).as(s"tf_$i")
        }: _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0))
      // constants combine engine-side ((k1+1.0), (1.0-b)) so both
      // engines do the identical IEEE double op sequence
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("id"), col("dl"), score.as("score_raw"))
      .orderBy(col("score_raw").desc, col("id"))
      .limit(topK)
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_raw").desc, col("id")))) // ≤ topK rows: safe
      .select(col("id"), col("rank").cast("int").as("rank"), col("dl"),
        round(col("score_raw"), 6).as("score"))
  }

  /** Reciprocal-rank fusion of two ranked retrieval lists — the
    * standard hybrid-search combiner (sparse BM25 + dense cosine):
    * `rrf(d) = Σ 1/(k + rank_i(d))` over the lists containing d,
    * k = 60 by convention (Cormack et al.). Rank-based, so the two
    * scorers need no calibration against each other — exactly why
    * RRF is the production default for hybrid retrieval. Inputs are
    * (id, rank) frames (top-k sized, not corpus-sized); the fuse is
    * a full-outer join over ≤ 2k rows, a driver-trivial tail on top
    * of whatever retrieval stacks produced the lists.
    */
  def rrfFuse(sparse: DataFrame, dense: DataFrame,
      k: Int = 60, topK: Int = 10): DataFrame = {
    val s = sparse.select(col("id"), col("rank").as("rank_s"))
    val d = dense.select(col("id"), col("rank").as("rank_d"))
    val fused = s.join(d, Seq("id"), "full")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(k) + col("rank_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_d")), lit(0.0))).as("rrf"))
    fused.orderBy(col("rrf").desc, col("id")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf").desc, col("id"))).cast("int")) // ≤ topK rows
      .select(col("id"), col("rank"), round(col("rrf"), 6).as("rrf"))
  }

  /** PII redaction: emails, IPv4 literals, and phone-shaped digit
    * runs replaced by typed placeholder tags — the scrubbing pass
    * every training corpus runs before anything else sees the text.
    * A pure `regexp_replace` chain (codegen'd, row-local, zero
    * shuffle); the patterns avoid backreferences and lookarounds so
    * RE2-based engines replay them identically. Email first (its
    * local part may contain digits the later patterns would chew on),
    * then IPs (dotted digits) before bare phone runs.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "<PHONE>")
  }

  /** HTML/markup boilerplate strip — the raw-crawl front door a C4 /
    * RefinedWeb-class pipeline runs before any text operator: drop
    * `<script>`/`<style>` blocks with their contents (payload, not
    * prose), drop every remaining tag, decode the five XML entities +
    * `&nbsp;`, collapse whitespace. A FIXED, ordered regexp chain —
    * row-local, codegen'd `regexp_replace` stack, zero shuffle — with
    * every pattern RE2-safe (no backrefs, no lookaround; the
    * [[redactPii]] cross-engine discipline), so the DuckDB oracle
    * replays the chain verbatim. Entities decode AFTER tag removal
    * (so `&lt;b&gt;` in prose stays literal text rather than becoming
    * a strippable tag — the order a correct extractor needs).
    *
    * Known limitation (shared by every regex-grade stripper): the tag
    * patterns terminate at the FIRST `>`, so a `>` inside a quoted
    * attribute (`<a title="x>y">`) leaves the attribute tail behind
    * as prose, and a script/style OPEN tag with `>` in an attribute
    * mis-scopes its block. Real-crawl HTML at that grubbiness level
    * wants a quote-aware alternation (`<("[^"]*"|'[^']*'|[^>])*>` —
    * still RE2-safe) or a proper extractor (trafilatura-class)
    * upstream; this chain is the deterministic, oracle-replayable
    * boilerplate pass, not an HTML parser.
    */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    // entity names are regex-safe literals (no metacharacters), so
    // the same strings are the patterns in BOTH engines; &amp; runs
    // LAST so a double-escaped "&amp;lt;" decodes one level per pass
    // (to "&lt;"), never jumping straight to "<"
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Within-document repetition signal: the fraction of word n-grams
    * that are duplicates of an earlier n-gram (1 − distinct/total) —
    * the Gopher/C4-style repetition filter. Row-local higher-order
    * array expressions (no explode, no shuffle); documents shorter
    * than `n` tokens score 0.
    */
  def repeatedNgramRatio(text: Column, n: Int = 3): Column =
    // one codegen'd walk — the transform(sequence)/array_distinct form
    // was interpreted and allocated every gram string into an array
    // before deduping (equivalence spec-pinned in GopherFusedSpec)
    graft.functions.GopherFunctions.repeated_ngram_ratio(text, n)

  /** Gopher-style quality RULES (Rae et al. 2021, App. A), each as a
    * named boolean plus the integer evidence it reads — the explicit
    * rule-list face of what [[qualityScore]] folds into one number.
    * Every threshold compare is INTEGER cross-multiplication (mean
    * word length ∈ [3,10] becomes `3n ≤ Σlen ≤ 10n`, duplicate-bigram
    * fraction ≤ 0.2 becomes `5(t−d) ≤ t`), so the whole face is exact
    * arithmetic — no float thresholds to drift between engines. Pure
    * row-local projection: scales as a scan.
    */
  /** The Gopher evidence columns and per-rule booleans, built ONCE so
    * the batch rule table and the streaming gate predicate can never
    * drift. Field order mirrors the output schema of [[gopherRules]].
    */
  private final case class GopherEvidence(
      nWords: Column, charSum: Column, nAlpha: Column, nSym: Column,
      nStops: Column, t2: Column, d2: Column) {
    val rWordcount: Column = nWords >= 50L && nWords <= 100000L
    val rMeanlen: Column = charSum >= nWords * 3L && charSum <= nWords * 10L
    val rAlpha: Column = nAlpha * 5L >= nWords * 4L
    val rSymbol: Column = nSym * 10L <= nWords
    val rStops: Column = nStops >= 2L
    val rRep2: Column = (t2 - d2) * 5L <= t2
    /** The five corpus-language-agnostic rules — everything except
      * the stop-word rule, which is an ENGLISH prior.
      */
    val structuralPass: Column =
      rWordcount && rMeanlen && rAlpha && rSymbol && rRep2
    val pass: Column = structuralPass && rStops
  }

  private def gopherEvidence(t: Column): GopherEvidence = {
    // all seven evidence integers from ONE codegen'd walk — the
    // composed form ran four interpreted HOF lambdas, a per-token
    // rlike regex, two replace() scans and an array_distinct of
    // freshly-allocated gram strings per row (4.7 s noop at sf0.1 for
    // the rules face alone; equivalence spec-pinned in GopherFusedSpec)
    val e = graft.functions.GopherFunctions.gopher_evidence(t)
    GopherEvidence(e.getField("n_words"), e.getField("char_sum"),
      e.getField("n_alpha"), e.getField("n_sym"), e.getField("n_stops"),
      // null-text rows: the legacy greatest(null − 1, 0)/when chain
      // produced t2 = 0, d2 = 0 (not null) — replicate exactly
      greatest(e.getField("t2"), lit(0L)),
      coalesce(e.getField("d2"), lit(0L)))
  }

  /** The five structural Gopher rules as one row-local predicate —
    * the streaming-gate rung's filter ([[gopherRules]]' `pass` minus
    * the English stop-word prior, which a multilingual ingest gate
    * must not apply).
    */
  def gopherStructuralPass(text: Column): Column =
    gopherEvidence(text).structuralPass

  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val e = gopherEvidence(col(textCol))
    df.select(col(idCol).as("id"),
      e.nWords.as("n_words"), e.charSum.as("char_sum"),
      e.nAlpha.as("n_alpha_words"), e.nSym.as("n_sym"),
      e.nStops.as("n_stop_hits"), e.t2.as("bigram_total"),
      e.d2.as("bigram_distinct"),
      e.rWordcount.as("r_wordcount"), e.rMeanlen.as("r_meanlen"),
      e.rAlpha.as("r_alpha"), e.rSymbol.as("r_symbol"),
      e.rStops.as("r_stops"), e.rRep2.as("r_rep2"),
      e.pass.as("pass"))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * `h := (h*31 + (tokenHash60(t) mod 2^20)) mod 2^30`, left fold in
    * token order. Order-sensitive (unlike a bag-of-words hash) so
    * reordered documents fingerprint differently; bounded moduli keep
    * ANSI int64 arithmetic overflow-free.
    */
  def fingerprint(text: Column): Column =
    // one codegen'd fold — the aggregate(transform(...)) form was
    // interpreted and built a 4-node Column tree (md5 hex → substring
    // → conv → cast) per token (equivalence spec-pinned in
    // GopherFusedSpec; [[TextHashing.hash60]] is the same formula)
    graft.functions.GopherFunctions.doc_fingerprint(text)

  /** Corpus-frequency vocabulary for [[encodeTokens]]: the `k` most
    * frequent whitespace tokens, ids 1..k in (freq desc, token asc)
    * order — a deterministic total order both engines reproduce
    * exactly (integer counts, string tie-break). Id 0 is reserved for
    * out-of-vocabulary. The collect is bounded by `k` — the same
    * train-then-ship shape as the IVF centroid fit: fit the
    * quantizer once, ship it into a row-local expression.
    */
  def buildVocab(df: DataFrame, textCol: String, k: Int): Seq[(String, Int)] = {
    require(k > 0 && k <= 65536, s"vocab size $k outside (0, 65536]")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1) }.toSeq
  }

  /** Fixed-vocabulary token encoding: text → array<int> of token ids,
    * 0 for out-of-vocabulary — the step between token counting and
    * context-window packing. The vocabulary travels as a map LITERAL
    * inside the expression (ships with the plan to every executor, no
    * join), so encoding is a row-local zero-shuffle projection the
    * scan streams through at any corpus size.
    */
  def encodeTokens(text: Column, vocab: Seq[(String, Int)]): Column = {
    val m = typedLit(vocab.toMap)
    transform(tokens(text), t => coalesce(element_at(m, t), lit(0)))
  }

  // ---- byte-fallback id codec ------------------------------------

  /** The byte-fallback id space (GPT-2's byte-level idea applied at
    * the fallback layer): id 0 stays reserved for unk but is NEVER
    * emitted by [[encodeIdsByteFallback]]; ids 1..256 are the 256 raw
    * byte values (byte b → id b+1); [[EowId]] = 257 marks end-of-word;
    * learned subword ids start at [[VocabIdBase]] = 258.
    */
  val ByteIdBase = 1
  val EowId = 257
  val VocabIdBase = 258

  /** Subword-id vocabulary for [[encodeIdsByteFallback]]: the `k`
    * most frequent subwords of the corpus under `rules`, ids
    * [[VocabIdBase]].. in (freq desc, subword asc) order — the
    * [[buildVocab]] artifact one layer down (subwords, not words).
    * Train nightly, ship as a literal; the collect is bounded by `k`.
    */
  def buildBpeVocab(df: DataFrame, textCol: String,
      rules: Seq[(String, String)], k: Int): Seq[(String, Int)] = {
    require(k > 0 && k <= 65536, s"vocab size $k outside (0, 65536]")
    bpeEncode(df, textCol, rules)
      .select(explode(col("subwords")).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p").asc)
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + VocabIdBase) }.toSeq
  }

  /** Text → token ids with BYTE fallback — no corpus byte is ever
    * dropped to unk: each word BPE-segments under `rules`; if every
    * piece is in `vocab` the word emits its piece ids, otherwise the
    * WHOLE word falls back to its UTF-8 bytes (ids 1..256), and every
    * word closes with [[EowId]]. Whole-word (not per-piece) fallback
    * is deliberate: the BPE symbol walk splits at UTF-16 code units,
    * so an astral-plane piece (emoji) can be a lone surrogate whose
    * UTF-8 bytes are undefined — the word string itself is always
    * well-formed, so its bytes round-trip exactly. Everything is
    * codegen'd built-ins (the byte decomposition rides
    * hex-of-encoded-word + substr + conv — no new expression class),
    * row-local, zero-shuffle; `vocab` ships as a map literal.
    *
    * Round-trip contract (the [[detokenize]] discipline one layer
    * down): [[decodeIdsByteFallback]] of the output equals the
    * single-space-normalized lower(text), for ANY input including
    * non-ASCII and emoji — and id 0 never appears (spec + oracle
    * faces pin both).
    *
    * Evaluation shape (r18): one fused codegen'd expression
    * ([[graft.functions.BpeIdsByteFallbackExpr]]), not the
    * split→transform→forall HOF composition it is semantically equal
    * to — Spark's higher-order lambdas are interpreted, and the HOF
    * form evaluated the BPE merge walk twice per word (once under
    * `forall`, once under `transform`).
    */
  def encodeIdsByteFallback(text: Column, rules: Seq[(String, String)],
      vocab: Seq[(String, Int)]): Column = {
    requireFallbackVocab(vocab)
    graft.functions.ByteFallbackFunctions
      .encode_ids_byte_fallback(text, rules, vocab)
  }

  /** The unigram twin of [[encodeIdsByteFallback]] — same id space,
    * same whole-word byte fallback, same [[decodeIdsByteFallback]]
    * inverse, with Viterbi segmentation under the trained piece table
    * in place of the BPE merge walk. The natural vocab is the piece
    * table itself ([[unigramIdVocab]]): every in-table piece has an
    * id, and the only OOV pieces are the encode expression's raw-char
    * unk emissions — exactly the words the byte fallback exists for.
    */
  def unigramEncodeIdsByteFallback(text: Column,
      pieces: Seq[(String, Double)], vocab: Seq[(String, Int)]): Column = {
    requireFallbackVocab(vocab)
    graft.functions.ByteFallbackFunctions
      .unigram_ids_byte_fallback(text, pieces, vocab)
  }

  /** Piece→id vocab straight from a trained unigram table (pieces in
    * rank order, [[graft.io.IndexStore.readUnigramPieces]]' shape):
    * rank-i piece → id i + [[VocabIdBase]]. Ship with the piece
    * table; both are one artifact.
    */
  def unigramIdVocab(pieces: Seq[(String, Double)]): Seq[(String, Int)] =
    pieces.zipWithIndex.map { case ((p, _), i) => p -> (i + VocabIdBase) }

  private def requireFallbackVocab(vocab: Seq[(String, Int)]): Unit =
    require(vocab.forall(_._2 >= VocabIdBase),
      s"vocab ids must be >= $VocabIdBase (0=unk, 1..256=bytes, 257=eow)")

  /** Ids → normalized text, inverting [[encodeIdsByteFallback]]: walk
    * the id stream accumulating (text, pending-byte-hex); a byte id
    * appends its hex pair, a subword id or [[EowId]] first FLUSHES the
    * pending bytes through one UTF-8 decode (multi-byte characters
    * reassemble exactly because the flush boundary is always a word
    * boundary), then appends the piece or a space. Fails LOUD on
    * anything outside the id space — the reserved unk 0
    * ([[encodeIdsByteFallback]] never emits it), NEGATIVE ids (a
    * foreign/corrupted stream), and UNMAPPED high ids — rather than
    * silently decoding plausible-looking garbage.
    *
    * Evaluation shape (r18): one fused codegen'd expression
    * ([[graft.functions.DecodeIdsByteFallbackExpr]]) — a single
    * StringBuilder pass, O(tokens). The `aggregate`-over-built-ins
    * composition it replaces (interpreted lambda + immutable
    * UTF8String concat per id) was O(tokens²) in copied bytes per
    * document, a scale cliff on long documents.
    */
  def decodeIdsByteFallback(ids: Column, vocab: Seq[(String, Int)]): Column =
    graft.functions.ByteFallbackFunctions.decode_ids_byte_fallback(ids, vocab)
}
