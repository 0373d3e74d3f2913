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

  /** Default for the DF-1 shingle prune in the n-gram Jaccard
    * self-join. The prune (drop shingles held by exactly one doc
    * before self-joining) is the right call once the self-join's
    * shuffle dominates — i.e. at corpus scale — but at bench scale its
    * extra agg + semi-join pass over the whole inverted index costs
    * 10-30% more than the self-join saves (measured warm ×3 at sf0.1;
    * the 3.3× in BENCH_r01 was single-run cold-plan noise).
    * Overridable per call; env knob for experiments.
    */
  val PruneDf1Default: Boolean =
    sys.env.get("GRAFT_NGRAM_PRUNE_DF1").exists(_.toBoolean)
}
