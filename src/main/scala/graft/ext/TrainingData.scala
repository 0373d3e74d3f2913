package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for a training-data pipeline: stable
  * splits, token-budget truncation, context-window packing, sampling.
  *
  * Split/truncate/pack are pure projections or single-window passes —
  * no shuffle beyond what the window needs — and every deterministic
  * operator is cross-engine reproducible (md5-derived hashing, the
  * same formula the dedup family pins), so they oracle-check.
  */
object TrainingData {

  /** Stable hash-based split: bucket = hash60(key) mod `buckets`.
    * Deterministic, data-independent, join-free — the property a
    * train/valid/test split must have so re-runs and backfills land
    * every row in the same split. `hash60` is the 60-bit md5 prefix
    * ([[graft.functions.TextHashing.hash60]]).
    */
  def splitBucket(key: Column, buckets: Int = 100): Column =
    (conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
      % buckets).cast("int")

  /** Tag rows train/valid/test by hash bucket: [0, trainPct) → train,
    * [trainPct, trainPct+validPct) → valid, rest → test.
    */
  def withSplit(df: DataFrame, key: Column,
      trainPct: Int = 80, validPct: Int = 10): DataFrame =
    df.withColumn("split_bucket", splitBucket(key))
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + validPct, "valid")
          .otherwise("test"))

  /** Truncate a document to its first `maxTokens` whitespace tokens
    * (the cheap context-budget guard before tokenization proper).
    */
  def truncateTokens(text: Column, maxTokens: Int): Column =
    concat_ws(" ", slice(split(text, " "), 1, maxTokens))

  /** Pack documents into fixed token-budget bins by running token
    * count in `orderCol` order: bin = floor(tokens_before_this_doc /
    * budget). Chunked packing — a document may straddle a boundary;
    * the semantic is "cut the ordered stream every `budget` tokens",
    * which one cumulative-sum window expresses exactly (true greedy
    * first-fit packing is inherently sequential — this is the
    * scalable, deterministic form).
    *
    * The unpartitioned window is a single-task sort — callers packing
    * more than ~10M docs should partition by a shard column first
    * (pass `shard`), which packs per shard independently.
    */
  def packIntoBins(df: DataFrame, textCol: String, orderCol: String,
      budget: Int, shard: Option[String] = None): DataFrame = {
    val w0 = shard.fold(Window.orderBy(col(orderCol)))(s =>
      Window.partitionBy(col(s)).orderBy(col(orderCol)))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", size(split(col(textCol), " ")))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      // TRUE integer division (`div`), not floor(a / b) — same exact-
      // long-math rule as chunkAtBoundaries: `/` is DOUBLE division,
      // exact only below 2^53; operands are non-negative so div ≡ floor.
      .withColumn("bin", expr(s"CAST(tokens_before DIV $budget AS INT)"))
  }

  /** Split each document into overlapping token-window chunks — the
    * standard pretraining/RAG chunker: chunk i covers tokens
    * [i·stride, i·stride + chunkSize) with stride = chunkSize −
    * overlap; a document shorter than one chunk yields exactly one
    * chunk. Pure projection + generator explode (row-local, no
    * shuffle); downstream ops see post-chunking volume.
    *
    * The chunk count is `ceil((n − overlap) / stride)` guarded with
    * `when(n ≤ chunkSize, 1)` — a bare sequence(0, negative) would
    * count BACKWARDS (same trap [[repeatByWeight]] documents).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap $overlap must be in [0, chunkSize $chunkSize)")
    val stride = chunkSize - overlap
    val nChunks = when(size(col("toks")) <= chunkSize, lit(1))
      .otherwise(ceil((size(col("toks")) - lit(overlap)).cast("double") / stride)
        .cast("int"))
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        concat_ws(" ",
          slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_tokens"))
  }

  /** Seeded uniform sample (Bernoulli per row). Deterministic for a
    * fixed seed AND fixed partitioning — document the caveat: Spark's
    * sample seeds per partition, so a repartition changes membership.
    * For partition-layout-independent sampling use [[splitBucket]]
    * with a fine modulus instead.
    */
  def uniformSample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Layout-independent sample: keep rows whose key hashes into the
    * first `permille` of 1000 buckets. Same stability story as
    * [[withSplit]]; oracle-expressible.
    */
  def hashSample(df: DataFrame, key: Column, permille: Int): DataFrame =
    df.filter(splitBucket(key, 1000) < permille)

  /** Stratified layout-independent sample: per-stratum keep rate in
    * permille (class rebalancing — downsample the over-represented
    * source/language/quality tier). A row survives iff
    * hash(key) mod 1000 < rate(stratum); strata absent from `rates`
    * keep `defaultPermille`. Pure filter — no shuffle, no count pass —
    * and every stratum's sample is a SUBSET of the unstratified
    * [[hashSample]] at a higher rate (nested samples, the property
    * that lets you grow/shrink a dataset without resampling history).
    */
  def stratifiedHashSample(df: DataFrame, key: Column, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int = 1000): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(splitBucket(key, 1000) < rate)
  }

  /** Deterministic fixed-N sample per stratum: exactly
    * min(n, |stratum|) rows per stratum, chosen by md5-hash order with
    * the key as total tie-break — layout-independent and re-run-stable
    * like every sampler here, but with an EXACT size ("exactly 10k
    * examples per language") that rate-based sampling cannot promise.
    * Costs one shuffle on the stratum (the rank window) — when a rate
    * is acceptable, [[stratifiedHashSample]] is the zero-shuffle path;
    * a skew note: a mega-stratum makes a mega-partition, so pick the
    * stratum column at sensible cardinality or pre-salt.
    */
  def fixedNPerStratum(df: DataFrame, key: Column, strataCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Probability-proportional-to-size sampling: keep a row with
    * probability `weight` (a per-row column in [0, 1]) — the
    * "sample documents proportional to quality" knob. Membership is
    * the same layout-independent md5 bucket as every sampler here
    * (`bucket < floor(weight·1000)`), so the sample is deterministic,
    * repeatable, and a pure filter the scan can stream through —
    * zero shuffles at any corpus size. Note the per-mille floor: a
    * weight below 1/1000 keeps nothing.
    */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column): DataFrame =
    df.filter(splitBucket(key, 1000) < floor(weight * 1000.0).cast("int"))

  /** Temperature-flattened corpus mix (α = 0.5): downsample each
    * stratum so expected sampled sizes are ∝ √n_s — the standard
    * multilingual/multi-source rebalancing knob ("sample language s
    * with probability ∝ n_s^α"), normalized so the SMALLEST stratum is
    * kept whole (a filter can only downsample). Per-stratum keep rate
    * in permille:
    *
    *   rate_s = floor( sqrt( (1\,000\,000 · n_min) div n_s ) )
    *
    * α is fixed at 0.5 deliberately: `sqrt` of an exact integer is
    * correctly rounded under IEEE-754 on every engine, and the
    * argument is produced by INTEGER division — so the rate is
    * bit-identical across Spark and any SQL oracle, with no
    * `pow(double)` cross-engine drift. Membership then reuses the
    * layout-independent [[splitBucket]] hash.
    *
    * Shape at scale: one tiny `groupBy(strata).count()` agg (rows =
    * #strata), min over that, broadcast back — the corpus itself is
    * scanned with a pure filter, never shuffled. Same ship-the-
    * quantizer pattern as IVF centroid seeding.
    */
  def temperatureMix(df: DataFrame, key: Column, strataCol: String): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(col(strataCol),
        floor(sqrt(expr("(1000000 * __nmin) div __n").cast("double")))
          .cast("int").as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(splitBucket(key, 1000) < col("__rate"))
      .select(df.columns.toIndexedSeq.map(col): _*) // restore caller's column order
  }

  /** Cap each stratum at a token budget: walk the stratum in md5-hash
    * order (key as total tie-break — the same stable order as
    * [[fixedNPerStratum]]) and keep documents while the running token
    * count BEFORE the document is under `budget` — so the straddling
    * document is kept and every stratum lands in
    * [budget, budget + max_doc_tokens). The "no more than N tokens
    * from any one domain" corpus-construction rule as one
    * cumulative-sum window. Skew note: one window partition per
    * stratum — a mega-stratum makes a mega-partition; pre-salt or
    * sub-shard `strataCol` if a single stratum exceeds executor-
    * partition scale.
    */
  def capTokensPerStratum(df: DataFrame, key: Column, strataCol: String,
      textCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(key.cast("string")), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__nt", size(split(col(textCol), " ")).cast("long"))
      .withColumn("__before", sum(col("__nt")).over(w) - col("__nt"))
      .filter(col("__before") < budget)
      .drop("__nt", "__before")
  }

  /** Weighted repetition (epoch upsampling): each row of stratum s is
    * emitted `weights(s)` times (default `defaultCopies`) with a
    * 0-based `copy` index — the standard "high-quality sources get
    * more epochs" mix knob. A projection + generator explode: no
    * shuffle; downstream shuffles see the post-repetition volume, so
    * apply this LAST in the assembly chain.
    */
  def repeatByWeight(df: DataFrame, strataCol: String,
      weights: Map[String, Int], defaultCopies: Int = 1): DataFrame = {
    val copies = weights.foldLeft(lit(defaultCopies)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(w)).otherwise(acc)
    }
    // weight 0 drops the stratum: explode of an empty array emits no
    // rows. (A bare sequence(0, copies-1) would NOT work — with start >
    // stop Spark's sequence counts BACKWARDS, yielding [0, -1].)
    df.withColumn("copy",
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Data-mixture planning under per-source repeat caps — the
    * data-constrained-scaling allocation step (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models": repeating a
    * source beyond ~4 epochs stops buying loss, so a mixture plan
    * must CAP repeats and re-spread the freed budget): given target
    * weights and a total token budget, each source gets its weight
    * share of the budget unless that exceeds `maxRepeat` epochs of
    * what the source actually has — capped sources contribute
    * `maxRepeat × avail` and the freed budget re-spreads over the
    * uncapped sources by renormalized weight, recursively (capping
    * can cascade).
    *
    * The cascade is NOT computed as an iterative fixpoint: water-
    * filling has a closed form — order sources by per-weight capacity
    * `maxRepeat·avail/weight` ascending and the capped set is a
    * PREFIX (removing a capped source only raises the per-weight
    * water level, so anything uncapped stays uncapped); the cut is
    * the first source whose capacity reaches its share of what the
    * prefix left. One catalog-sized window pass, EXACT integer
    * arithmetic throughout (the one double is the sort ratio), so
    * DuckDB replays the whole plan bit for bit. The per-source token
    * sums are the only corpus-sized work; the plan itself runs on a
    * #sources-row frame (single-task window, the quantile-literals
    * shape — a mixture catalog is dimension-sized by construction).
    *
    * `weights` is a (source, weight) table — small non-negative ints
    * (permille-style; magnitudes only matter relatively). Sources in
    * the corpus but not the table plan at weight 0 (planned 0);
    * weighted sources absent from the corpus plan at avail 0 (capped
    * at 0 — a demand the corpus cannot meet, visible in the plan
    * rather than silently dropped). Uncapped planned tokens use
    * integer division, so the total plan undershoots the budget by
    * < #uncapped tokens, never overshoots.
    */
  def mixturePlan(corpus: DataFrame, weights: DataFrame, budget: Long,
      maxRepeat: Int = 4, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(budget >= 0, s"mixturePlan: negative budget $budget")
    require(maxRepeat >= 1, s"mixturePlan: maxRepeat $maxRepeat < 1")
    val r = maxRepeat.toLong
    val avail = corpus.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(split(col(textCol), " "))).cast("long")
        .as("avail_tokens"))
    val w = weights.select(col(weights.columns.head).as("source"),
      col(weights.columns(1)).cast("int").as("weight"))
      // fail loud on a duplicate source row: the full-outer join would
      // emit one plan row PER duplicate, each carrying the source's
      // full avail — the window sums then double-count stock and
      // weight and the plan can silently overshoot the budget
      .withColumn("weight",
        when(count(lit(1)).over(Window.partitionBy("source")) > 1,
          raise_error(concat(
            lit("mixturePlan: duplicate weight rows for source "),
            col("source"))))
          .otherwise(col("weight")))
    val joined = avail.join(w, Seq("source"), "full_outer")
      .na.fill(Map("avail_tokens" -> 0L, "weight" -> 0))
      // fail loud in-plan on a negative weight: a silent negative
      // would flip the cut-point inequality and corrupt every share
      .withColumn("weight",
        when(col("weight") < 0, raise_error(concat(
          lit("mixturePlan: negative weight for source "), col("source"))))
          .otherwise(col("weight")))
    // capacity-per-weight order; weight-0 rows carry no demand and
    // sort last (they cannot cap); ties break by source name
    val k0 = when(col("weight") === 0, 1).otherwise(0)
    val k1 = when(col("weight") === 0, lit(0.0))
      .otherwise(col("avail_tokens").cast("double") * maxRepeat
        / col("weight"))
    val win = Window.orderBy(col("__k0"), col("__k1"), col("source"))
    val prev = win.rowsBetween(Window.unboundedPreceding, -1)
    val upto = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = win.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    joined
      .withColumn("__k0", k0).withColumn("__k1", k1)
      .withColumn("__aprev",
        coalesce(sum("avail_tokens").over(prev), lit(0L)))
      .withColumn("__wall", sum("weight").over(full).cast("long"))
      .withColumn("__wrem", col("__wall")
        - coalesce(sum("weight").over(prev), lit(0L)).cast("long"))
      .withColumn("__brem", lit(budget) - lit(r) * col("__aprev"))
      // the cut test: this source's capacity covers its share of what
      // the (all-capped) prefix left — cross-multiplied, stays in longs
      .withColumn("__cond", lit(r) * col("avail_tokens") * col("__wrem")
        >= col("weight").cast("long") * col("__brem"))
      .withColumn("capped",
        sum(when(col("__cond"), 1).otherwise(0)).over(upto) === 0)
      .withColumn("__bfin", lit(budget) - lit(r) * coalesce(
        sum(when(col("capped"), col("avail_tokens"))).over(full), lit(0L)))
      .withColumn("__wfin", coalesce(
        sum(when(!col("capped"), col("weight"))).over(full), lit(0L))
        .cast("long"))
      .withColumn("ideal_tokens", when(col("__wall") === 0, 0L)
        .otherwise(expr(s"CAST((weight * CAST($budget AS BIGINT)) DIV __wall AS BIGINT)")))
      .withColumn("planned_tokens",
        when(col("capped"), lit(r) * col("avail_tokens"))
          .when(col("__wfin") === 0, 0L)
          .otherwise(expr("CAST((weight * __bfin) DIV __wfin AS BIGINT)")))
      .withColumn("repeat_factor", when(col("avail_tokens") === 0, lit(null))
        .otherwise(round(col("planned_tokens").cast("double")
          / col("avail_tokens"), 6)))
      .select(col("source"), col("avail_tokens"), col("weight"),
        col("ideal_tokens"), col("planned_tokens"),
        col("repeat_factor").cast("double").as("repeat_factor"),
        col("capped"))
  }

  /** The seeded permutation key [[trainingOrder]] sorts by — exposed
    * so compositions that immediately re-establish the order anyway
    * (a running-sum window) can take the projection WITHOUT the
    * operator's global orderBy: the window's own sort supersedes it,
    * and paying a full range-sort of the token payload just to have
    * the next exchange discard it doubles the emission shuffle.
    */
  def trainingOrderKey(keys: Seq[Column], seed: String): Column =
    conv(substring(md5(
      concat_ws(":", lit(seed) +: keys.map(_.cast("string")): _*)),
      1, 15), 16, 10).cast("long")

  /** Deterministic global training order: the "shuffle the corpus
    * before writing the epoch stream" step. Every row gets a 60-bit
    * `order_key` = md5(seed : key₁ : … : keyₙ) and the frame comes
    * back totally ordered by (order_key, keys) — a seeded permutation
    * that is layout-independent (pure hash of row identity), re-run
    * stable, and changes wholesale with the seed. Keying on
    * (doc_id, copy) after [[repeatByWeight]] scatters a document's
    * epoch copies across the whole stream — the interleave a
    * multi-epoch mix needs so repeats don't sit adjacent.
    *
    * Shape at scale: one distributed range-partition sort (Spark
    * samples boundaries, then sorts partitions independently) — the
    * standard total-order write; no global window, no driver
    * involvement. Write the result with a partition-numbered sink and
    * the file order IS the training order.
    */
  def trainingOrder(df: DataFrame, keys: Seq[Column], seed: String): DataFrame =
    df.withColumn("order_key", trainingOrderKey(keys, seed))
      .orderBy(col("order_key") +: keys: _*)

  /** Shared pack tail of every emission operator: the running-sum
    * window over the caller's order columns (optionally per shard)
    * and the integer bin cut. Single-site on purpose — the bin math
    * is a correctness surface (the floor-of-double → integer-DIV fix
    * had to touch four hand-copies of this block before it was
    * factored). Bin/block ids are INT: one stream (or one shard) is
    * bounded to 2^31−1 blocks — ~4.3×10^12 tokens at budget 2000 —
    * and Spark's ANSI mode FAILS LOUD on the cast past that; shard
    * the emission long before a single reader's stream approaches
    * that volume (the same ≲10M-doc guidance the global window
    * already carries, two orders of magnitude earlier).
    */
  private def packOrdered(ordered: DataFrame, orderCols: Seq[Column],
      shard: Option[String], budget: Int): DataFrame = {
    val w0 = shard.fold(Window.orderBy(orderCols: _*))(sc =>
      Window.partitionBy(col(sc)).orderBy(orderCols: _*))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered
      .withColumn("n_tok", size(col("toks")))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tok").cast("long")).over(w)
          - col("n_tok"), lit(0L)))
      .withColumn("bin", expr(s"CAST(tokens_before DIV $budget AS INT)"))
  }

  /** END-TO-END training-batch emission — the engine's actual end
    * product, composed as ONE operator: tokenize with a TRAINED merge
    * table ([[TextAnalysis.bpeEncode]] over
    * [[graft.io.IndexStore.readBpeMerges]]' persisted artifact — the
    * nightly-train/ship shape), TRUNCATE each document's token stream
    * to the `maxTokens` context budget, apply the seeded global
    * [[trainingOrder]] permutation, and PACK the ordered stream into
    * `budget`-token bins (the [[packIntoBins]] cut rule: bin = floor
    * of tokens-before / budget). Returns one row per document —
    * (idCol, order_key, toks, n_tok, tokens_before, bin) — where
    * `toks` IS the payload (the truncated subword array) and the
    * row order (order_key, id) IS the training order; write with a
    * partition-numbered sink and readers consume bins in file order.
    *
    * Everything is deterministic and layout-independent: the merge
    * table is an input, truncation is a row-local slice, the
    * permutation a pure hash of (seed, id), and the cut integer
    * arithmetic over exact longs — so bin CONTENTS are reproducible
    * on any cluster layout (spec-pinned) and the whole composition
    * replays in SQL (the tokenizer half rides the checked-in golden,
    * the order/pack half is recomputed live — the q_ann_ivf_trained
    * semi-independent oracle precedent).
    *
    * Scale note, inherited from [[packIntoBins]]: with `shard = None`
    * the running-sum window is one global range-sorted task — the
    * exact single-stream semantic, fine to ~10M docs. Past that,
    * pass `shard` (any parallelism unit: hash bucket, source, date):
    * each shard becomes an independent reader's stream with its own
    * seeded order and its own bin numbering — the standard
    * data-parallel emission layout (one stream per reader), exactly
    * [[packIntoBins]]'s sharded contract.
    */
  /** `phaseCols` (optional) prepend CURRICULUM phases to the stream
    * order: the seeded shuffle runs WITHIN each phase, and phases
    * follow each other in phase order — the staged data schedule
    * ("anneal on the high-quality stratum last") a real pretraining
    * run feeds the trainer, expressed as nothing more than extra
    * leading window-order keys (no extra shuffle; the window's sort
    * just gains prefix columns). Phase expressions must be
    * deterministic row-local functions of the input row.
    */
  def emitBatches(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, shard: Option[String] = None,
      phaseCols: Seq[Column] = Nil): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(budget >= 1, s"budget must be >= 1: $budget")
    val phases = phaseCols.zipWithIndex.map { case (c, i) =>
      c.as(s"__phase$i")
    }
    val keep = Seq(col(idCol).as("id"),
      slice(col("subwords"), 1, maxTokens).as("toks")) ++ shard.map(col) ++
      phases
    val enc = TextAnalysis.bpeEncode(df, textCol, merges).select(keep: _*)
    // the key projection only — NOT trainingOrder's global orderBy:
    // the window below re-establishes exactly that order (globally or
    // per shard), so the operator's own range-sort of the token
    // payload would be computed and then discarded at the window's
    // exchange — one wasted full shuffle+sort of the tokenized corpus
    // on the engine's end-product path
    val ordered = enc.withColumn("order_key",
      trainingOrderKey(Seq(col("id")), seed))
    val orderCols = phaseCols.indices.map(i => col(s"__phase$i")) ++
      Seq(col("order_key"), col("id"))
    packOrdered(ordered, orderCols, shard, budget)
      .select(Seq(col("id").as(idCol), col("order_key"), col("toks"),
        col("n_tok"), col("tokens_before"), col("bin"))
        ++ shard.map(col): _*)
  }

  /** EXACT-token-block emission — the concat-and-chunk form of
    * [[emitBatches]]: the same persisted-tokenizer encode, truncate,
    * and seeded order, but the ordered token stream is SPLIT at exact
    * `budget` boundaries instead of assigning each document wholly to
    * the bin where it starts. [[emitBatches]]' bins overflow the
    * budget by up to maxTokens − 1 (the floor-of-start-offset cut) —
    * a trainer consumes FIXED-length sequences, so the end product a
    * training run reads is this face: every block sums to exactly
    * `budget` tokens (the stream's final block per shard excepted),
    * and a document straddling a boundary is split, its remainder
    * carrying into the next block.
    *
    * Returns one row per (document, block) PIECE — (idCol, order_key,
    * block, off, n_tok, toks) where `off` is the piece's 0-based
    * token offset within its document, `n_tok` the piece length, and
    * `toks` the piece's subword slice; a document spanning b blocks
    * emits b rows whose pieces concatenate (in block order) back to
    * its truncated stream. Zero-token documents emit nothing.
    *
    * Shape at scale: [[emitBatches]]' plan plus one row-local
    * generator explode + two row-local slices — no extra shuffle, no
    * extra sort; the block arithmetic is exact long math over the
    * running sum the window already computed, so the whole cut
    * replays in integer SQL. Sharding contract inherited unchanged:
    * with `shard` set, each shard is an independent stream with its
    * own seeded order and its own block numbering.
    */
  def emitChunks(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, shard: Option[String] = None,
      phaseCols: Seq[Column] = Nil): DataFrame = {
    val base = emitBatches(df, idCol, textCol, merges, maxTokens, budget,
      seed, shard, phaseCols)
    val out = chunkAtBoundaries(base, budget,
      Seq(col(idCol), col("order_key")) ++ shard.map(col))
    // shard rides LAST, the emitBatches column contract
    shard.fold(out)(sc => out.select(
      Seq(idCol, "order_key", "block", "off", "n_tok", "toks").map(col)
        :+ col(sc): _*))
  }

  /** The boundary-cut tail [[emitChunks]] and its streaming twin
    * share: given a frame carrying (toks, n_tok, tokens_before) —
    * any running-sum packing, whatever produced the offset — explode
    * each document over the blocks it overlaps
    * (floor(before/budget) .. floor((before + n − 1)/budget)) and
    * slice its piece per block. Returns `keep` ++ (block, off, n_tok,
    * toks) with n_tok/toks rebound to the PIECE. Row-local
    * (generator + two slices): no shuffle, no sort — the cut is
    * integer math over the sum the caller's window already computed.
    */
  private[graft] def chunkAtBoundaries(base: DataFrame, budget: Int,
      keep: Seq[Column]): DataFrame = {
    // n ≥ 1 guaranteed by the filter (a 0-token doc's sequence would
    // count backwards — the repeatByWeight trap). TRUE integer
    // division (`div`), not floor(a / b): the `/` operator is DOUBLE
    // division in Spark, exact only below 2^53 — `div` keeps the
    // DIVISION exact long math, matching the oracle's `//` (operands
    // are non-negative here, so div ≡ floor). The block ID itself is
    // INT with the [[packOrdered]] bound: ≤ 2^31−1 blocks per stream,
    // ANSI failing loud past it — shard long before then.
    val firstB = expr(s"CAST(tokens_before DIV $budget AS INT)")
    val lastB =
      expr(s"CAST((tokens_before + n_tok - 1L) DIV $budget AS INT)")
    base.filter(col("n_tok") > 0)
      .withColumn("block", explode(sequence(firstB, lastB)))
      .withColumn("__off",
        greatest(col("block").cast("long") * budget - col("tokens_before"),
          lit(0L)))
      .withColumn("__len",
        least(col("n_tok").cast("long"),
          (col("block") + 1).cast("long") * budget - col("tokens_before"))
          - col("__off"))
      .select(keep ++ Seq(col("block"),
        col("__off").cast("int").as("off"),
        col("__len").cast("int").as("n_tok"),
        slice(col("toks"), col("__off").cast("int") + 1,
          col("__len").cast("int")).as("toks")): _*)
  }

  /** Encode-ONCE weighted emission — the production form of the
    * repeatByWeight→emitBatches composition: emitting a repeated
    * corpus through [[emitBatches]] re-TOKENIZES every epoch copy,
    * paying the encode (the pipeline's expensive row-local pass) ×
    * mean-copies. Here the corpus is tokenized exactly once and the
    * epoch copies are generator rows over the ENCODED frame — the
    * repetition is a projection of token arrays, never a
    * re-tokenization. Each (id, copy) example takes the seeded order
    * key over BOTH keys, so a document's epoch copies scatter across
    * the whole stream (the [[trainingOrder]] interleave), and the
    * pack math runs over post-repetition volume exactly as the
    * composed form. Output: (idCol, copy, order_key, toks, n_tok,
    * tokens_before, bin) [+ shard], one row per example.
    *
    * `phaseCols` composes the [[emitBatches]] curriculum contract in:
    * phases are extra LEADING window-order keys evaluated on the
    * post-repetition example row — visible columns are `id` (the
    * RENAMED idCol), `copy`, the strata column, and the shard column;
    * reading `copy` gives "every document's first epoch before any
    * repeat" as `col("copy")` itself. The seeded (id, copy) shuffle runs within
    * each phase, and the running sum stays continuous across phase
    * boundaries. No extra shuffle: the window's sort just gains
    * prefix columns.
    */
  def emitBatchesRepeated(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, strataCol: String, weights: Map[String, Int],
      defaultCopies: Int = 1, shard: Option[String] = None,
      phaseCols: Seq[Column] = Nil): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(budget >= 1, s"budget must be >= 1: $budget")
    val keep = Seq(col(idCol).as("id"),
      slice(col("subwords"), 1, maxTokens).as("toks"), col(strataCol)) ++
      shard.map(col)
    val enc = TextAnalysis.bpeEncode(df, textCol, merges).select(keep: _*)
    val rep = repeatByWeight(enc, strataCol, weights, defaultCopies)
    // phases materialize AFTER the repeat so they can key on `copy`
    val phased = phaseCols.zipWithIndex.foldLeft(rep) { case (acc, (c, i)) =>
      acc.withColumn(s"__phase$i", c)
    }
    val ordered = phased.withColumn("order_key",
      trainingOrderKey(Seq(col("id"), col("copy")), seed))
    val orderCols = phaseCols.indices.map(i => col(s"__phase$i")) ++
      Seq(col("order_key"), col("id"), col("copy"))
    packOrdered(ordered, orderCols, shard, budget)
      .select(Seq(col("id").as(idCol), col("copy"), col("order_key"),
        col("toks"), col("n_tok"), col("tokens_before"), col("bin"))
        ++ shard.map(col): _*)
  }

  /** The FULL production emission, composed as ONE operator:
    * weighted epoch-upsampling (encode-ONCE, [[emitBatchesRepeated]])
    * × curriculum phases × EXACT `budget`-token blocks
    * ([[emitChunks]]' boundary cut) × optional sharding — the
    * combination a real pretraining nightly runs, which as pairwise
    * compositions forced a choice between re-tokenizing epoch copies
    * (repeatByWeight → emitChunks) and giving up exact blocks
    * (emitBatchesRepeated alone).
    *
    * One row per (example, block) PIECE: (idCol, copy, order_key,
    * block, off, n_tok, toks) [+ shard] — `off`/`n_tok`/`toks`
    * rebound to the piece exactly as [[emitChunks]]; a (doc, copy)
    * example spanning b blocks emits b rows whose pieces concatenate
    * back to its truncated token stream. Shape at scale: the
    * [[emitBatchesRepeated]] plan (one encode pass, generator-row
    * repetition, one window) plus the row-local
    * [[chunkAtBoundaries]] explode — no extra shuffle or sort over
    * the pairwise composition, and the encode is still paid ×1.
    */
  def emitChunksRepeated(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, strataCol: String, weights: Map[String, Int],
      defaultCopies: Int = 1, shard: Option[String] = None,
      phaseCols: Seq[Column] = Nil): DataFrame = {
    val base = emitBatchesRepeated(df, idCol, textCol, merges, maxTokens,
      budget, seed, strataCol, weights, defaultCopies, shard, phaseCols)
    val out = chunkAtBoundaries(base, budget,
      Seq(col(idCol), col("copy"), col("order_key")) ++ shard.map(col))
    // shard rides LAST, the emitBatches column contract
    shard.fold(out)(sc => out.select(
      Seq(idCol, "copy", "order_key", "block", "off", "n_tok", "toks")
        .map(col) :+ col(sc): _*))
  }

  /** TAKEDOWN BLAST-RADIUS over a committed exact-block emission —
    * the right-to-be-forgotten answer for an already-emitted stream:
    * given the emission's (example, block) pieces (an [[emitChunks]]
    * frame, or the same rows read back from the sink) and a set of
    * deleted document ids, report every block that HOLDS a deleted
    * doc's pieces (with piece/token counts and the count of live
    * pieces sharing the block — the co-resident content a block-level
    * purge would collaterally drop), plus the re-emission radius.
    *
    * THE RE-EMISSION CONTRACT (why the radius matters): exact blocks
    * cut a seeded totally-ordered token stream every `budget` tokens,
    * so removing a document deletes its tokens from the stream and
    * every later token shifts left — re-emitting without the doc
    * changes EVERY block from the first affected one onward, not just
    * the blocks the doc touched. The containment argument is
    * per-shard: a shard is an independent stream with its own order
    * and numbering, so blocks strictly BEFORE the shard's first
    * affected block are byte-identical under re-emission, and other
    * shards are untouched entirely — `first_affected` and
    * `blocks_shifted` (= last block − first affected + 1) quantify
    * exactly what must be re-served per shard. Store-side takedown
    * ([[graft.io.IndexStore.deleteFromParagraphFuzzyIndex]] et al.)
    * removes the CONTENT going forward; this report answers for the
    * epochs already on disk.
    *
    * Shape at scale: one equi-join of the pieces against the deleted
    * id set (broadcast — a takedown list is small by nature), one
    * map-side-combinable per-block aggregate, and a shard-sized
    * summary joined back; output is bounded by touched blocks, never
    * the stream.
    */
  def emitTakedownReport(chunks: DataFrame, deleted: DataFrame,
      idCol: String, shard: Option[String] = None): DataFrame = {
    val delIds = deleted
      .select(col(deleted.columns.head).as("__del_id")).distinct()
    val tagged = chunks
      .join(broadcast(delIds), col(idCol) === col("__del_id"), "left")
      .withColumn("__is_del", col("__del_id").isNotNull)
    val perBlock = tagged
      .groupBy(shard.map(col).toSeq :+ col("block"): _*)
      .agg(
        sum(when(col("__is_del"), 1L).otherwise(0L)).as("n_del_pieces"),
        sum(when(col("__is_del"), col("n_tok").cast("long"))
          .otherwise(0L)).as("n_del_tokens"),
        sum(when(col("__is_del"), 0L).otherwise(1L)).as("n_live_pieces"))
    val summary = perBlock
      .groupBy(shard.map(col).toSeq: _*)
      .agg(
        min(when(col("n_del_pieces") > 0, col("block")))
          .as("first_affected"),
        max(col("block")).as("last_block"))
    val touched = perBlock.filter(col("n_del_pieces") > 0)
    val joined = shard.fold(touched.crossJoin(broadcast(summary)))(sc =>
      touched.join(broadcast(summary), Seq(sc)))
    joined
      .withColumn("blocks_shifted",
        col("last_block") - col("first_affected") + 1)
      .select(shard.map(col).toSeq ++ Seq(col("block"),
        col("n_del_pieces"), col("n_del_tokens"), col("n_live_pieces"),
        col("first_affected"), col("blocks_shifted")): _*)
  }

  /** MULTIMODAL-INTERLEAVED emission — media refs composed into the
    * training stream: documents carrying a media attachment (one row
    * in `media`: id → content digest, e.g.
    * [[graft.io.IndexStore.readImageHashes]]' dHash) get ONE leading
    * `placeholder` token spliced before their text tokens, so the
    * emitted stream is the interleaved image-text sequence a
    * multimodal pretrain consumes: the trainer maps the placeholder
    * to its image embedding slot, and the (block, offset) of each
    * placeholder — derivable as (tokens_before div budget,
    * tokens_before mod budget) because the placeholder is the
    * example's FIRST token — plus `media_hash` IS the dataloader's
    * media manifest. Otherwise exactly [[emitBatches]]: persisted-
    * tokenizer encode, truncate to `maxTokens` (the placeholder rides
    * ON TOP of the text budget), seeded order, budget packing; run
    * the output through the [[emitChunks]] cut for exact blocks.
    *
    * Output: (idCol, order_key, toks, n_tok, tokens_before, bin,
    * media_hash) [+ shard] — `media_hash` null for text-only docs,
    * `toks` carrying the placeholder at position 1 for media docs.
    * Shape at scale: one equi-join against the media digest table
    * (the persisted index — the codec pass never runs here) before
    * the same single window; row-local splice, no extra shuffle.
    */
  /** `posCol` (optional, a column of `media`) places each doc's
    * placeholder at that TOKEN OFFSET within the truncated stream
    * (clamped to [0, truncated length] — out-of-range means append)
    * instead of at the head: the true interleave, where the image
    * slot sits at the paragraph that carries it. `ph_off` in the
    * output is the placeholder's realized within-doc offset (null for
    * text-only docs), so the manifest math generalizes to
    * (tokens_before + ph_off) div/mod budget.
    *
    * PRECONDITION: `media` carries at most ONE row per id — a
    * duplicate id would duplicate the document in the stream (the
    * join fans out). Several slots per document is
    * [[emitInterleavedMulti]].
    */
  def emitInterleaved(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, media: DataFrame, mediaIdCol: String, hashCol: String,
      placeholder: String = "<img>",
      shard: Option[String] = None,
      posCol: Option[String] = None): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(budget >= 1, s"budget must be >= 1: $budget")
    val m = media.select(Seq(col(mediaIdCol).as("__mid"),
      col(hashCol).as("media_hash")) ++
      posCol.map(p => col(p).as("__pos")): _*)
    val keep = Seq(col(idCol).as("id"),
      slice(col("subwords"), 1, maxTokens).as("__t")) ++ shard.map(col)
    // coalesce BEFORE the clamp: a NULL pos on a media row must mean
    // head placement (offset 0), not a null ph_off that nulls the
    // spliced slice and poisons the running token sum downstream
    val phOff = posCol.fold(lit(0))(_ =>
      least(greatest(coalesce(col("__pos").cast("int"), lit(0)), lit(0)),
        size(col("__t"))))
    val enc = TextAnalysis.bpeEncode(df, textCol, merges).select(keep: _*)
      .join(m, col("id") === col("__mid"), "left")
      .withColumn("ph_off",
        when(col("media_hash").isNotNull, phOff))
      .withColumn("toks",
        when(col("media_hash").isNotNull,
          concat(slice(col("__t"), lit(1), col("ph_off")),
            array(lit(placeholder)),
            slice(col("__t"), col("ph_off") + 1,
              size(col("__t")) - col("ph_off"))))
          .otherwise(col("__t")))
    val ordered = enc.withColumn("order_key",
      trainingOrderKey(Seq(col("id")), seed))
    packOrdered(ordered, Seq(col("order_key"), col("id")), shard, budget)
      .select(Seq(col("id").as(idCol), col("order_key"), col("toks"),
        col("n_tok"), col("tokens_before"), col("bin"), col("media_hash"),
        col("ph_off")) ++ shard.map(col): _*)
  }

  /** Interleaved emission cut into EXACT `budget`-token blocks — the
    * fixed-length multimodal batch a trainer consumes:
    * [[emitInterleaved]]'s stream (placeholders spliced at their
    * `posCol` offsets) through the same [[chunkAtBoundaries]] tail as
    * [[emitChunks]]. One row per (doc, block) piece, carrying
    * `media_hash`/`ph_off`/`tokens_before` so a projection answers
    * "which block and in-block offset holds this doc's media slot"
    * ((tokens_before + ph_off) div/mod budget) — the dataloader
    * manifest, now block-aligned. Row-local tail, no extra shuffle.
    */
  /** MULTI-media interleave — several media slots per document, each
    * at its own token position (the real multimodal pretraining
    * shape: a page with three figures emits three placeholders, each
    * at the paragraph that carries it). `media` holds one row per
    * SLOT (id, pos, hash); per doc the slots sort by (clamped pos,
    * hash) — a deterministic total order — and splice left-to-right,
    * so the i-th slot's realized offset is `pos_i + i` (each earlier
    * insert shifts the stream by one). Output one row per doc:
    * emitBatches' columns plus `media` = array<struct<off, hash>> of
    * realized within-doc offsets (null for text-only docs); explode
    * it and apply (tokens_before + off) div/mod budget for the
    * dataloader manifest.
    *
    * Shape at scale: one groupBy over the MEDIA table (slots
    * aggregate to per-doc arrays — a media-sized shuffle, never the
    * corpus), one equi-join, then the same single window; the splice
    * is row-local higher-order array work (O(n·k) per doc, k = slot
    * count).
    */
  def emitInterleavedMulti(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, media: DataFrame, mediaIdCol: String, posCol: String,
      hashCol: String, placeholder: String = "<img>",
      shard: Option[String] = None): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(budget >= 1, s"budget must be >= 1: $budget")
    val m = media.groupBy(col(mediaIdCol).as("__mid"))
      .agg(collect_list(struct(col(posCol).cast("int").as("pos"),
        col(hashCol).as("hash"))).as("__m"))
    val keep = Seq(col(idCol).as("id"),
      slice(col("subwords"), 1, maxTokens).as("__t")) ++ shard.map(col)
    val joined = TextAnalysis.bpeEncode(df, textCol, merges).select(keep: _*)
      .join(m, col("id") === col("__mid"), "left")
    val n = size(col("__t"))
    // clamp each slot to [0, truncated length], then the
    // deterministic total order (clamping is monotone, but ties and
    // the collect_list order need the sort)
    val cl = sort_array(transform(col("__m"),
      mm => struct(
        least(greatest(coalesce(mm("pos"), lit(0)), lit(0)), n).as("pos"),
        mm("hash").as("hash"))))
    val spliced = joined
      .withColumn("__cl", when(col("__m").isNotNull, cl))
      .withColumn("media",
        when(col("__cl").isNotNull,
          transform(col("__cl"), (mm, i) =>
            struct((mm("pos") + i).cast("int").as("off"),
              mm("hash").as("hash")))))
      .withColumn("toks",
        when(col("__cl").isNull, col("__t"))
          .otherwise(flatten(transform(sequence(lit(0), n), i =>
            concat(
              transform(filter(col("__cl"), mm => mm("pos") === i),
                _ => lit(placeholder)),
              when(i < n, slice(col("__t"), i + 1, lit(1)))
                .otherwise(array().cast("array<string>")))))))
    val ordered = spliced.withColumn("order_key",
      trainingOrderKey(Seq(col("id")), seed))
    packOrdered(ordered, Seq(col("order_key"), col("id")), shard, budget)
      .select(Seq(col("id").as(idCol), col("order_key"), col("toks"),
        col("n_tok"), col("tokens_before"), col("bin"), col("media"))
        ++ shard.map(col): _*)
  }

  def emitInterleavedChunks(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], maxTokens: Int, budget: Int,
      seed: String, media: DataFrame, mediaIdCol: String, hashCol: String,
      placeholder: String = "<img>",
      shard: Option[String] = None,
      posCol: Option[String] = None): DataFrame = {
    val base = emitInterleaved(df, idCol, textCol, merges, maxTokens,
      budget, seed, media, mediaIdCol, hashCol, placeholder, shard, posCol)
    val out = chunkAtBoundaries(base, budget,
      Seq(col(idCol), col("order_key"), col("media_hash"), col("ph_off"),
        col("tokens_before")) ++ shard.map(col))
    shard.fold(out)(sc => out.select(
      Seq(idCol, "order_key", "media_hash", "ph_off", "tokens_before",
        "block", "off", "n_tok", "toks").map(col) :+ col(sc): _*))
  }

  // ---- span-corruption example construction ----------------------

  /** T5/UL2-style span-corruption training pairs, fully
    * deterministic: partition each document's tokens into fixed
    * blocks of `blockLen`, and in every FULL block mask one
    * `spanLen`-token span whose offset is hash-picked from
    * (doc id, block index) — `input` replaces each masked span with
    * its block's `<extra_id_b>` sentinel, `target` is the sentinel +
    * the masked tokens, in block order (the partial tail block stays
    * uncorrupted). Defaults approximate the T5 recipe's 15% noise
    * density (3/20). Sentinel-splice of `target` back into `input`
    * reconstructs the document exactly (spec-pinned).
    *
    * Everything is row-local higher-order array expressions — no
    * explode, no join, no shuffle: the construction pass runs at
    * scan speed on any corpus size, and the md5-derived offsets make
    * it reproducible across engines, so the oracle replays every
    * span choice.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 20, spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1 && spanLen < blockLen,
      s"spanCorrupt: need 1 <= spanLen < blockLen, got $spanLen/$blockLen")
    def sentinel(b: Column): Column =
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    val ws = split(col(textCol), " ")
    val nb = (size(ws) / lit(blockLen)).cast("int") // full blocks only
    // one hash-picked 0-based span offset per full block
    val starts = when(nb >= 1,
      transform(sequence(lit(0), nb - 1), b =>
        pmod(graft.ext.TextAnalysis.tokenHash60(
            concat(col(idCol).cast("string"), lit(":"), b.cast("string"))),
          lit((blockLen - spanLen + 1).toLong)).cast("int")))
      .otherwise(array().cast("array<int>"))
    val d = df.withColumn("__ws", ws).withColumn("__st", starts)
    val masked = transform(sequence(lit(0), size(col("__ws")) - 1), i => {
      val b = (i / lit(blockLen)).cast("int")
      val off = pmod(i, lit(blockLen))
      // null (→ filtered) for a tail block: no start recorded there
      val s = try_element_at(col("__st"), b + 1)
      when(s.isNotNull && off === s, sentinel(b))
        .when(s.isNotNull && off > s && off < s + spanLen,
          lit(null).cast("string"))
        .otherwise(element_at(col("__ws"), i + 1))
    })
    val input = array_join(filter(masked, x => x.isNotNull), " ")
    val target = when(size(col("__st")) === 0, lit(""))
      .otherwise(array_join(
        transform(sequence(lit(0), size(col("__st")) - 1), b => {
          val s = element_at(col("__st"), b + 1)
          val toks = (0 until spanLen).map(k =>
            element_at(col("__ws"), b * blockLen + s + k + 1))
          concat_ws(" ", sentinel(b) +: toks: _*)
        }), " "))
    d.select(col(idCol).as("id"), input.as("input"), target.as("target"),
      size(col("__st")).as("n_spans"))
  }

  // ---- DSIR-style importance resampling --------------------------

  /** Per-term importance log-ratios in integer micro-units —
    * the DSIR recipe (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling") with unigram features:
    * `llr(term) = log10 p_target(term) − log10 p_raw(term)` under
    * add-one smoothing over the UNION vocabulary, rounded once to
    * micro-units so every downstream per-document sum is an EXACT
    * integer (the [[graft.ext.QualityModel.nbTermWeightsMicro]]
    * determinism discipline — DSIR with unigram features IS that
    * two-class model with "drawn from the target corpus" as the
    * class). Two corpus scans (raw + target) into vocab-sized count
    * frames, a full-outer union join, one 1-row totals broadcast —
    * the output is a vocab-sized artifact you train nightly and ship.
    */
  def importanceWeightsMicro(raw: DataFrame, target: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(explode(split(col(textCol), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as(as))
    val v = counts(raw, "cr")
      .join(counts(target, "ct"), Seq("term"), "full")
      .na.fill(0L, Seq("cr", "ct"))
    val stats = v.agg(
      sum("cr").as("tr"), sum("ct").as("tt"), count(lit(1)).as("nv"))
    v.crossJoin(broadcast(stats))
      .select(col("term"),
        QualityModel.microLlr(col("ct"), col("tt"), col("cr"), col("tr"),
          col("nv")).as("llr_micro"))
  }

  /** Gumbel-top-n importance resample of `raw` under the
    * [[importanceWeightsMicro]] table: per document, the exact
    * integer log-weight sum rescaled to NATURAL log (the micro-llr is
    * log10-based, so the weight term is multiplied by ln 10 — without
    * that the Gumbel trick samples ∝ w^(1/ln 10) ≈ w^0.434, a
    * silently flattened temperature), plus hash-seeded Gumbel(0,1)
    * noise (`−ln(−ln u)`, u from the md5 bucket family every sampler
    * here uses) — the standard without-replacement trick that makes
    * selection probability ∝ exp(log-weight), i.e. ∝ the importance
    * weight itself, while staying fully deterministic and
    * layout-independent. Sampling (not thresholding) is DSIR's point:
    * a hard top-n-by-weight collapses onto near-duplicates of the
    * target's head, while the noise trades tail diversity against
    * weight exactly.
    *
    * Shape at scale: token⋈weights equi-join + per-doc agg (the
    * unigram-LM scoring shape), then `orderBy().limit(n)` — a
    * distributed TakeOrdered, never a single-partition sort. For the
    * scan-speed serving path, ship the weight table as a literal map
    * and fold row-locally ([[graft.ext.QualityModel.nbScoreMicro]] —
    * same artifact contract).
    */
  def importanceResample(raw: DataFrame, weights: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = raw.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    // LEFT join, OOV → 0 (the NB-gate convention: a term the weights
    // artifact never saw carries no evidence either way). When the
    // pool IS the training raw corpus — the registry face — the union
    // vocabulary covers every token and this is an inner join; under
    // the ship-the-artifact contract (weights trained yesterday,
    // scored today) it keeps every document sampleable instead of
    // silently dropping all-new-vocabulary docs. Broadcast: the
    // corpus token stream must never shuffle on the skew-prone term
    // key (the nbQualityScores discipline).
    val perDoc = toks.join(broadcast(weights), Seq("term"), "left")
      .groupBy("id")
      .agg(sum(coalesce(col("llr_micro"), lit(0L))).as("sum_llr"))
    val u = (splitBucket(col("id"), 1 << 20).cast("double") + 0.5) /
      lit((1 << 20).toDouble)
    perDoc
      .withColumn("score",
        col("sum_llr").cast("double") / lit(1000000.0) * lit(math.log(10.0))
          + -log(-log(u)))
      .orderBy(col("score").desc, col("id"))
      .limit(n)
      .select(col("id"), col("sum_llr"), round(col("score"), 6).as("score"))
  }
}
