package graft.ext

/** Shared hashing constants for the dedup/fingerprint operators.
  *
  * Every hash here is expressible identically in Spark and in the
  * DuckDB oracle: the base token/shingle hash is the first 15 hex
  * digits of md5 (60 bits, < 2^60 so it always fits a signed int64),
  * and the minhash family is the classic universal family
  * (a*x + b) mod p over p = 2^31 - 1 — chosen so a*x stays < 2^62 and
  * never overflows int64 (Spark 4 runs ANSI mode, where overflow
  * throws; DuckDB overflows throw too).
  */
object HashDefs {
  /** Mersenne prime 2^31 - 1 — modulus of the minhash family. */
  val P: Long = 2147483647L

  /** Number of minhash functions (signature length). */
  val K: Int = 32

  /** LSH banding: bands × rowsPerBand == K. 8 bands of 4 rows targets
    * the Jaccard ~0.5 similarity threshold (s-curve midpoint
    * (1/8)^(1/4) ≈ 0.59).
    */
  val Bands: Int = 8
  val RowsPerBand: Int = 4

  /** Deterministic (a, b) seeds for the K hash functions. */
  val seeds: Seq[(Long, Long)] = (0 until K).map { i =>
    val a = (2654435761L * (i + 1) + 12345L) % P
    val b = (40503L * (i + 1) + 17L) % P
    (if (a == 0L) 1L else a, b)
  }

  /** Word-shingle width for the n-gram dedup operators. */
  val ShingleN: Int = 3

  /** Rolling-fingerprint moduli (kept small so h*31 + t never
    * approaches int64 range under ANSI arithmetic).
    */
  val TokenMod: Long = 1048576L    // 2^20 — per-token hash range
  val FpMod: Long = 1073741824L    // 2^30 — fingerprint range

  /** Simhash width (bits of the 60-bit md5-derived token hash used). */
  val SimhashBits: Int = 60

  /** Document-frequency threshold above which a shingle's posting
    * list takes the bucketed triangle self-join instead of the plain
    * pair self-join. A df-d key generates d²/2 pairs inside whichever
    * single task owns the key in the plain join: below ~d=512 that is
    * noise, above it is the straggler that stalls the pair-count
    * stage on a skewed corpus (boilerplate headers, templated spam).
    * Env knob for experiments; per-call override on the dedup ops.
    */
  val HotShingleDf: Int =
    sys.env.get("GRAFT_HOT_SHINGLE_DF").map(_.toInt).getOrElse(512)

  /** Bucket count B for the triangle self-join on hot shingles: a hot
    * posting list spreads its pair generation over B(B+1)/2 cell
    * tasks at the price of replicating hot postings (B+1)/2 times.
    * B=16 turns a df-10⁵ key's 5·10⁹ single-task pairs into 136 cells
    * of ~37M — task-sized — while the replication stays 8.5× on ONLY
    * the hot rows.
    */
  val HotShingleBuckets: Int =
    sys.env.get("GRAFT_HOT_SHINGLE_BUCKETS").map(_.toInt).getOrElse(16)

  /** Exact-duplicate fraction at which the collapse front's digest
    * join + cache materialization pays for itself: below it the
    * pairwise ops run directly over per-document shingle sets (the
    * collapse would be a flat tax on an already-deduped corpus);
    * above it every identical cluster of size d would multiply its
    * posting lists by d and the pair stage by d², so collapsing wins.
    */
  val CollapseDupFrac: Double =
    sys.env.get("GRAFT_COLLAPSE_DUP_FRAC").map(_.toDouble).getOrElse(0.02)

  /** Largest exact-duplicate clique tolerated WITHOUT the collapse
    * even when the global duplicate fraction is small: a single
    * d-member byte-identical clique costs d²/2 candidate pairs and
    * d× posting-list inflation however rare duplicates are overall,
    * so one hot clique flips the probe to collapse. 32 ⇒ at most
    * ~500 wasted intra pairs per clique on the no-collapse path.
    */
  val CollapseHotClique: Int =
    sys.env.get("GRAFT_COLLAPSE_HOT_CLIQUE").map(_.toInt).getOrElse(32)

  /** Estimated shingle-set size of an incoming slice above which
    * [[Dedup.minhashCrossPairs]] abandons its forced broadcasts and
    * falls back to shuffle joins. A normal crawl day ≪ the corpus
    * and SHOULD broadcast (the corpus then never shuffles); but a
    * forced `broadcast()` has no safety valve — an unexpectedly
    * large slice would OOM the driver instead of degrading, the same
    * failure class the IVF centroid collect guards with its
    * `require`. 512 MB estimated ≈ well under executor broadcast
    * budgets while covering any real "day's slice".
    */
  val CrossBroadcastMaxBytes: Long =
    sys.env.get("GRAFT_CROSS_BROADCAST_MAX_BYTES").map(_.toLong)
      .getOrElse(512L * 1024 * 1024)

  /** Serialized-size cap for an eagerly-collected Bloom filter
    * ([[Dedup.bloomProbeEager]]). The filter's size is set by
    * `expectedSeen`/`fpp` alone (~1.2 MB per million keys at 1%), so
    * this trips on a mis-sized sizing parameter, never on data
    * volume; 256 MB ≈ 200M expected keys at 1%.
    */
  val BloomDriverMaxBytes: Long =
    sys.env.get("GRAFT_BLOOM_DRIVER_MAX_BYTES").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)

  /** Span-pairs collapse trigger ratio: [[Dedup.crossDocSpanPairs]]
    * collapses exact-duplicate cliques only when
    * `(n − nd) · maxk ≥ ratio · n` — duplicated rows times worst
    * clique size as an upper-bound proxy for the direct path's Σd²
    * co-occurrence term, against corpus size as the proxy for what
    * the collapse join + member expansions cost. Measured bracket
    * (SCALE.md §substring): ratio 1.8 and 7.8 → direct wins 2-3×,
    * ratio 92 → wash, ratio 455 → collapse wins 8×; 64 sits under
    * the wash point so mega-clique corpora collapse and diffuse
    * duplication stays on the (faster) direct index.
    */
  val SpanCollapseRatio: Long =
    sys.env.get("GRAFT_SPAN_COLLAPSE_RATIO").map(_.toLong).getOrElse(64L)

  /** Serialized size at which [[Dedup.bloomProbeEager]] ships the
    * filter as a Spark BROADCAST variable instead of a plan Literal.
    * A literal is duplicated per referencing plan branch and, under
    * streaming, re-serialized with every micro-batch's plan; a
    * broadcast ships once per executor. Below this size the literal
    * is simpler and the duplication is noise (the gate-scale filters
    * are ~1 KB); above it the broadcast wins — 4 MB ≈ 3M expected
    * keys at fpp 0.01.
    */
  val BloomBroadcastMinBytes: Long =
    sys.env.get("GRAFT_BLOOM_BROADCAST_MIN_BYTES").map(_.toLong)
      .getOrElse(4L * 1024 * 1024)
}
