package graft.ext

import graft.functions.UnigramSeg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the SentencePiece sibling of the
  * BPE family ([[TextAnalysis.bpeTrainLocal]]): instead of greedy
  * merges, train a piece → probability table by EM over all
  * segmentations (Kudo 2018, "Subword Regularization"), prune the
  * seed vocabulary by likelihood loss down to the target size, and
  * encode by Viterbi (max-probability segmentation,
  * [[graft.functions.UnigramEncodeSupport]]).
  *
  * Training is driver-local over the collected word-frequency
  * vocabulary, the [[TextAnalysis.bpeTrainLocal]] discipline, for the
  * same two reasons plus one more:
  *  - the corpus only matters for the ONE distributed scan that
  *    builds (word, freq) — web-scale corpora have ~10⁷–10⁸ distinct
  *    words, executor- and driver-sized — and every EM/prune round
  *    after that is vocabulary-local;
  *  - the per-round cost of a job-per-EM-step loop would be driver
  *    scheduling, not data;
  *  - EM's M-step is a SUM OF DOUBLES across the vocabulary. A
  *    distributed double-sum is ordering-dependent (parquet split /
  *    shuffle arrival order), so a cluster E-step would make the
  *    trained table run-to-run nondeterministic; the driver loop sums
  *    in one fixed (UTF-8-sorted) order, so training is bit-stable —
  *    what the golden-fixture oracle and the run-to-run spec pin.
  *
  * Determinism contract: words and pieces are always iterated in
  * UTF-8-byte order (Spark StringType order); all tie-breaks are
  * explicit (seed cut: count desc then piece asc; prune cut: loss
  * desc then piece asc; Viterbi: strict `>` with piece length
  * ascending → shortest final piece on exact ties).
  *
  * Segmentation positions are CODE POINT boundaries throughout
  * ([[UnigramSeg]]): pieces never contain an unpaired surrogate, so
  * the table survives the UTF8String/parquet round trip on non-BMP
  * text and encode stays lossless.
  */
object UnigramTok {

  /** UTF-8 byte order == Spark StringType (UTF8String) order — NOT
    * java.lang.String's UTF-16 code-unit order (disagrees on
    * supplementary characters). Same comparator as bpeTrainLocal's.
    */
  private def cmpUtf8(a: String, b: String): Int = {
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
  private val utf8Ord: Ordering[String] = (a, b) => cmpUtf8(a, b)

  /** log(e^a + e^b) without overflow; -inf-safe. */
  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** The one distributed corpus touch all driver-local entry points
    * share: (word, freq) vocabulary — tokenize, casefold, cap, collect,
    * sort UTF-8-asc (the fixed iteration order every double sum
    * depends on).
    */
  private def collectVocab(df: DataFrame, textCol: String, maxVocab: Int,
      caller: String): (Array[String], Array[Long]) = {
    val vocabDf = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // count-then-collect (the bpeTrainLocal discipline): fail loud
    // before shipping an over-cap vocabulary to the driver
    val nVocab = vocabDf.count()
    require(nVocab <= maxVocab,
      s"$caller: vocabulary has $nVocab words > maxVocab=$maxVocab — " +
        "train on a sampled corpus or raise the cap deliberately")
    val rows = vocabDf.collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)(utf8Ord)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Trained table state: pieces sorted UTF-8-asc, aligned log-probs,
    * and the piece→index map the DPs look up through.
    */
  private final class Model(val pieces: Array[String], val lp: Array[Double]) {
    val idx = new java.util.HashMap[String, Integer](pieces.length * 2)
    var maxLen = 1
    for (i <- pieces.indices) {
      idx.put(pieces(i), i)
      if (pieces(i).length > maxLen) maxLen = pieces(i).length
    }
    def lpOf(s: String): Double = {
      val i = idx.get(s)
      if (i == null) Double.NegativeInfinity else lp(i.intValue())
    }
  }

  /** Forward DP: log P(word) = log Σ over all segmentations, filled
    * into `logA` (length n+1, caller-allocated). Shared by the E-step
    * and [[unigramLogLik]] so the two can never drift.
    */
  private def forward(word: String, m: Model, logA: Array[Double]): Double = {
    val n = word.length
    logA(0) = 0.0
    var i = 1
    while (i <= n) {
      logA(i) = Double.NegativeInfinity
      if (UnigramSeg.isBoundary(word, i)) {
        val lMax = math.min(m.maxLen, i)
        var l = 1
        while (l <= lMax) {
          if (UnigramSeg.isBoundary(word, i - l)) {
            val plp = m.lpOf(word.substring(i - l, i))
            if (plp != Double.NegativeInfinity)
              logA(i) = logAdd(logA(i), logA(i - l) + plp)
          }
          l += 1
        }
      }
      i += 1
    }
    logA(n)
  }

  /** One EM step over the word vocabulary: forward-backward per word
    * (expected count of every piece occurrence under the CURRENT
    * probabilities), then renormalize. Returns the new log-probs and
    * the corpus log-likelihood BEFORE the update (for the
    * monotonicity pin in the spec).
    */
  private def emStep(words: Array[String], freqs: Array[Long],
      m: Model): (Array[Double], Double) = {
    val exp = new Array[Double](m.pieces.length)
    var ll = 0.0
    var wi = 0
    while (wi < words.length) {
      val word = words(wi)
      val f = freqs(wi).toDouble
      val n = word.length
      val logA = new Array[Double](n + 1)
      val z = forward(word, m, logA)
      // a word leaves the model's support when EM has zeroed every
      // piece covering one of its spans (the character_coverage<1
      // analogue). Skip it this round — including it would divide by
      // z = -inf and NaN-poison every expected count (observed: an
      // all--inf table on the f10 corpus). Encode still covers such
      // words via the unk fallback.
      if (z != Double.NegativeInfinity) {
        ll += f * z
        // backward: logB(i) = log P(suffix word[i,n))
        val logB = new Array[Double](n + 1)
        logB(n) = 0.0
        var i = n - 1
        while (i >= 0) {
          logB(i) = Double.NegativeInfinity
          if (UnigramSeg.isBoundary(word, i)) {
            val lMax = math.min(m.maxLen, n - i)
            var l = 1
            while (l <= lMax) {
              if (UnigramSeg.isBoundary(word, i + l)) {
                val plp = m.lpOf(word.substring(i, i + l))
                if (plp != Double.NegativeInfinity)
                  logB(i) = logAdd(logB(i), plp + logB(i + l))
              }
              l += 1
            }
          }
          i -= 1
        }
        // expected count of the occurrence (i, l): posterior mass of
        // every segmentation path through that span
        var i2 = 0
        while (i2 < n) {
          val lMax = math.min(m.maxLen, n - i2)
          var l = 1
          while (l <= lMax) {
            val pi = m.idx.get(word.substring(i2, i2 + l))
            if (pi != null) {
              val k = pi.intValue()
              val post = logA(i2) + m.lp(k) + logB(i2 + l) - z
              if (post != Double.NegativeInfinity) exp(k) += f * math.exp(post)
            }
            l += 1
          }
          i2 += 1
        }
      }
      wi += 1
    }
    var total = 0.0
    var k = 0
    while (k < exp.length) { total += exp(k); k += 1 }
    val out = new Array[Double](exp.length)
    k = 0
    while (k < exp.length) {
      out(k) =
        if (exp(k) > 0.0) math.log(exp(k)) - math.log(total)
        else Double.NegativeInfinity
      k += 1
    }
    (out, ll)
  }

  /** Viterbi best segmentation score + pieces of one string under the
    * model, optionally with one piece masked out (the prune step's
    * "alternative segmentation of x without x"). Tie rule matches the
    * encode expression: strict `>`, piece length ascending.
    */
  private def viterbi(word: String, m: Model, mask: Int = -1):
      (Double, List[Int]) = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      if (UnigramSeg.isBoundary(word, i)) {
        val lMax = math.min(m.maxLen, i)
        var l = 1
        while (l <= lMax) {
          if (UnigramSeg.isBoundary(word, i - l)) {
            val pi = m.idx.get(word.substring(i - l, i))
            if (pi != null && pi.intValue() != mask) {
              val s = best(i - l) + m.lp(pi.intValue())
              if (s > best(i)) { best(i) = s; back(i) = l }
            }
          }
          l += 1
        }
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) (Double.NegativeInfinity, Nil)
    else {
      var ids = List.empty[Int]
      var p = n
      while (p > 0) {
        ids = m.idx.get(word.substring(p - back(p), p)).intValue() :: ids
        p -= back(p)
      }
      (best(n), ids)
    }
  }

  /** Train a unigram-LM piece table: one distributed scan builds the
    * (word, freq) vocabulary (tokenization = space-split + lowercase,
    * the BPE trainer's), a `require`-capped collect ships it, and the
    * driver runs seed → (EM × emIters → prune by likelihood loss)
    * until the vocabulary fits `vocabSize`.
    *
    * Seed = every single CODE POINT seen (never PRUNED — though one
    * whose EM mass underflows to zero still leaves via the zero-mass
    * filter below, the character_coverage<1 analogue; encode's unk
    * fallback keeps segmentation total either way) + the top
    * `seedSize` multi-code-point substrings of words (length ≤
    * `maxPieceLen` UTF-16 units, cut at code-point boundaries).
    * Prune drops the lowest-loss multi pieces, where loss(x) =
    * viterbiCount(x) · (lp(x) − altLp(x)) — how much corpus Viterbi
    * likelihood is lost if x's uses must re-segment without it;
    * pieces the Viterbi pass never uses drop first.
    *
    * Output: (rank, piece, logp) with rank 1 = most probable
    * (tie: piece UTF-8-asc), logp from the final normalized EM step.
    */
  def unigramTrain(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000, emIters: Int = 2,
      shrink: Double = 0.25, maxVocab: Int = 1 << 22): DataFrame = {
    import scala.collection.mutable
    val spark = df.sparkSession
    val (words, freqs) = collectVocab(df, textCol, maxVocab, "unigramTrain")

    // ---- seed: substring counts (code points mandatory, top multis) --
    val subCount = mutable.HashMap.empty[String, Double]
    var wi = 0
    while (wi < words.length) {
      val word = words(wi); val f = freqs(wi).toDouble
      var i = 0
      while (i < word.length) {
        if (UnigramSeg.isBoundary(word, i)) {
          val lMax = math.min(maxPieceLen, word.length - i)
          var l = 1
          while (l <= lMax) {
            if (UnigramSeg.isBoundary(word, i + l)) {
              val s = word.substring(i, i + l)
              subCount.update(s, subCount.getOrElse(s, 0.0) + f)
            }
            l += 1
          }
        }
        i += 1
      }
      wi += 1
    }
    val singles = subCount.keysIterator
      .filter(UnigramSeg.isSingleCodePoint(_)).toArray.sorted(utf8Ord)
    require(vocabSize >= singles.length + 1,
      s"unigramTrain: vocabSize=$vocabSize cannot hold the " +
        s"${singles.length} mandatory single-code-point pieces")
    val multis = subCount.iterator
      .filter { case (p, _) => !UnigramSeg.isSingleCodePoint(p) }.toArray
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(
        Ordering.Double.TotalOrdering, utf8Ord))
      .take(seedSize).map(_._1)
    var pieces = (singles ++ multis).sorted(utf8Ord)
    var lps: Array[Double] = {
      // initial probs ∝ substring count, summed in piece order
      val total = pieces.foldLeft(0.0)((acc, p) => acc + subCount(p))
      pieces.map(p => math.log(subCount(p)) - math.log(total))
    }

    // ---- EM × emIters, prune, repeat until the table fits ----
    var done = false
    while (!done) {
      val m0 = new Model(pieces, lps)
      var m = m0
      var it = 0
      while (it < emIters) {
        val (nlp, _) = emStep(words, freqs, m)
        m = new Model(pieces, nlp)
        it += 1
      }
      lps = m.lp
      if (pieces.length <= vocabSize) done = true
      else {
        // Viterbi counts: how often each piece is actually USED
        val vc = new Array[Double](pieces.length)
        wi = 0
        while (wi < words.length) {
          val (_, ids) = viterbi(words(wi), m)
          val f = freqs(wi).toDouble
          ids.foreach(k => vc(k) += f)
          wi += 1
        }
        // loss of dropping x: its uses re-segment at the runner-up
        // score — never-used pieces carry zero loss and drop first
        val nSingles = pieces.count(UnigramSeg.isSingleCodePoint(_))
        val keepMultis = math.max(vocabSize - nSingles,
          math.ceil((pieces.length - nSingles) * (1.0 - shrink)).toInt - 1)
        val scored = pieces.indices
          .filter(k => !UnigramSeg.isSingleCodePoint(pieces(k))).map { k =>
            val loss =
              if (vc(k) == 0.0) Double.NegativeInfinity
              else {
                val (alt, _) = viterbi(pieces(k), m, mask = k)
                vc(k) * (m.lp(k) - alt) // alt=-inf never: singles stay
              }
            (loss, pieces(k))
          }
        val kept = scored.sortBy { case (loss, p) => (-loss, p) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, utf8Ord))
          .take(keepMultis).map(_._2)
        val next = (pieces.filter(UnigramSeg.isSingleCodePoint(_)) ++ kept)
          .sorted(utf8Ord)
        val keptLp = next.map(p => lps(m0.idx.get(p).intValue()))
        pieces = next
        lps = keptLp // renormalized by the next round's EM
      }
    }

    import spark.implicits._
    // a piece can finish with zero EM mass (logp = -inf) when
    // vocabSize exceeds the number of pieces the corpus can actually
    // use — Viterbi could never pick it, so it leaves the table (the
    // survivors' probabilities already sum to 1 without it)
    pieces.indices
      .filter(k => lps(k) != Double.NegativeInfinity)
      .sortBy(k => (-lps(k), pieces(k)))(Ordering.Tuple2(
        Ordering.Double.TotalOrdering, utf8Ord))
      .zipWithIndex
      .map { case (k, r) => (r + 1, pieces(k), lps(k)) }
      .toDF("rank", "piece", "logp")
  }

  /** Corpus log-likelihood under a piece table: Σ_w freq(w) ·
    * log P(w), with P(w) the forward-summed probability over ALL
    * segmentations — the quantity EM maximizes. Driver-local over the
    * collected vocabulary (same cap discipline as training); the spec
    * pins that more EM iterations never decrease it. Shares
    * [[forward]] with the E-step, so the measured model can never
    * drift from the trained one.
    */
  def unigramLogLik(df: DataFrame, textCol: String,
      pieces: Seq[(String, Double)], maxVocab: Int = 1 << 22): Double = {
    val (words, freqs) = collectVocab(df, textCol, maxVocab, "unigramLogLik")
    val sorted = pieces.sortBy(_._1)(utf8Ord)
    val m = new Model(sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    var ll = 0.0
    var wi = 0
    while (wi < words.length) {
      ll += freqs(wi) * forward(words(wi), m, new Array[Double](words(wi).length + 1))
      wi += 1
    }
    ll
  }

  /** Encode the corpus with a trained piece table ([[unigramTrain]]'s
    * output): adds `pieces` — Viterbi max-probability segmentation,
    * row-local under one codegen'd expression with the compiled table
    * shipped once per plan. Case-folds like training did.
    */
  def unigramEncode(df: DataFrame, textCol: String,
      pieces: Seq[(String, Double)]): DataFrame =
    df.withColumn("pieces",
      graft.functions.UnigramFunctions.unigram_encode(
        lower(col(textCol)), pieces))

  /** Word-boundary-MARKED unigram encode — the unigram twin of
    * [[TextAnalysis.bpeEncodeMarked]] (one shared `</w>` convention,
    * one shared [[TextAnalysis.detokenize]]): Viterbi segments each
    * word exactly as [[unigramEncode]] does (per-word split is the
    * expression's own convention, so segmentation is identical —
    * spec-pinned), and the word-final piece carries the marker a
    * detokenizer needs. Compositional (per-word encode in a
    * higher-order transform), no new expression class. Literal marker
    * occurrences escape exactly as [[TextAnalysis.bpeEncodeMarked]]
    * ([[TextAnalysis.escapeMarker]]) so the shared
    * [[TextAnalysis.detokenize]] restores them.
    */
  def unigramEncodeMarked(df: DataFrame, textCol: String,
      pieces: Seq[(String, Double)],
      marker: String = "</w>"): DataFrame =
    df.withColumn("pieces_marked",
      flatten(transform(
        filter(split(TextAnalysis.escapeMarker(lower(col(textCol)), marker),
          " ", -1), w => w =!= ""),
        w => {
          val g = graft.functions.UnigramFunctions.unigram_encode(w, pieces)
          concat(slice(g, lit(1), size(g) - 1),
            array(concat(element_at(g, -1), lit(marker))))
        })))

  /** Subword-regularization encoding (Kudo 2018 §3): adds `pieces` —
    * a segmentation SAMPLED ∝ P(seg)^α per word instead of the
    * Viterbi argmax, the data-augmentation variant that exposes a
    * model to alternative tokenizations of the same text. Draws come
    * from a deterministic splitmix64 stream over (seed, word content,
    * position), so the sampled corpus is layout-stable and
    * reproducible — same golden-oracle discipline as the Viterbi
    * face. Row-local, one codegen'd expression.
    */
  def unigramSample(df: DataFrame, textCol: String,
      pieces: Seq[(String, Double)], seed: Long = 42L,
      alpha: Double = 0.5): DataFrame =
    df.withColumn("pieces",
      graft.functions.UnigramFunctions.unigram_sample(
        lower(col(textCol)), pieces, seed, alpha))
}
