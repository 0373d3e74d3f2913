package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{CorpusPipeline, Dedup, HashDefs, Multimodal, QualityModel, Similarity, TextAnalysis, TrainingData}
import graft.queries.CoreQueries.{Q, stagingDir}

/** Training-data-pipeline extension operators (BASELINE.json north
  * star): dedup, similarity search, text analysis, multimodal — each
  * registered with a DuckDB oracle where the math is reproducible in
  * SQL (hashes are md5-derived on both sides; see
  * [[graft.ext.HashDefs]]). LSH-approximate operators whose output is
  * probabilistic get rows-only checks plus ScalaTest recall tests.
  */
object ExtQueries {
  import HashDefs._

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  // ---- shared SQL fragments (mirror the Scala ops exactly) ----------

  /** 60-bit md5 hash — SQL twin of [[TextAnalysis.tokenHash60]]. */
  private def h60(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 15)) AS BIGINT)"

  /** Distinct word 3-shingle hashes per doc — SQL twin of
    * [[Dedup.wordShingleHashes]]. `src` lets the same CTE run over a
    * filtered document set (q_corpus_prepare scopes it to the
    * pipeline's survivors).
    */
  private def shinglesSqlFrom(src: String): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id AS id, ${h60("shingle")} AS h
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(1, len(ws) - ${ShingleN - 2}),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $src)))""".stripMargin
  private val shinglesSql = shinglesSqlFrom("documents")

  /** SQL twin of the NB model admission gate (q_quality_gate /
    * q_stream_admit_quality): the whole trained model replayed —
    * integer teacher labels on the seen half, per-term class counts,
    * one micro-unit llr per term (the only rounded double, identical
    * IEEE op sequence to [[QualityModel.nbWeightsMicro]]), then exact
    * BIGINT per-doc sums over the fresh slice.
    */
  private val qualityModelCtes: String = {
    val b = s"${h60("CAST(doc_id AS VARCHAR)")} % 1000"
    s"""qlab AS (
       |  SELECT CASE WHEN len(text) >= 200 AND
       |      len(list_filter(string_split(text, ' '),
       |        t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) >= 5
       |    THEN 1 ELSE 0 END AS y, text
       |  FROM documents WHERE $b < 500),
       |qtoks AS (SELECT y, unnest(string_split(text, ' ')) AS term FROM qlab),
       |qts AS (SELECT term, sum(y) AS c1, sum(1 - y) AS c0
       |        FROM qtoks GROUP BY term),
       |qst AS (SELECT sum(c1) AS t1, sum(c0) AS t0, count(*) AS v FROM qts),
       |qw AS (SELECT term,
       |    CAST(round((log10(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE))
       |              - log10(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + v AS DOUBLE)))
       |         * 1000000.0, 0) AS BIGINT) AS lm
       |  FROM qts CROSS JOIN qst),
       |qfresh AS (SELECT doc_id, text FROM documents
       |           WHERE $b >= 500 AND $b < 600),
       |qft AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM qfresh),
       |model_pass AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, CAST(sum(coalesce(lm, 0)) AS BIGINT) AS ms
       |    FROM qft LEFT JOIN qw USING (term) GROUP BY doc_id)
       |  WHERE ms > 0)""".stripMargin
  }

  private val qualityGateSql: String =
    s"""WITH $qualityModelCtes
       |SELECT doc_id FROM model_pass ORDER BY doc_id""".stripMargin

  private val jaccardTailSql =
    """sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
      |shared AS (
      |  SELECT a.id AS ia, b.id AS ib, count(*) AS shared
      |  FROM shp a JOIN shp b ON a.h = b.h AND a.id < b.id
      |  GROUP BY 1, 2)
      |SELECT ia AS id_a, ib AS id_b,
      |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
      |FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
      |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Minhash signature CTE: mh0..mh{K-1} per doc. */
  private val minhashSql: String = {
    val mins = seeds.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $P) AS mh$i"
    }.mkString(",\n    ")
    s"""hx AS (SELECT id, h % $P AS x FROM sh),
       |mh AS (SELECT id,
       |    $mins
       |  FROM hx GROUP BY id)""".stripMargin
  }

  /** LSH banding CTE (UNION ALL, one leg per band). */
  private val bandsSql: String = (0 until Bands).map { j =>
    val cols = (j * RowsPerBand until (j + 1) * RowsPerBand)
      .map(i => s"CAST(mh$i AS VARCHAR)").mkString(", ")
    s"SELECT id, $j AS band, md5(concat_ws(',', $cols)) AS bh FROM mh"
  }.mkString("bands AS (\n  ", "\n  UNION ALL\n  ", ")")

  private val simhashVotesSql = (0 until SimhashBits).map { jj =>
    s"SUM(CASE WHEN (h >> $jj) & 1 = 1 THEN 1 ELSE -1 END) AS v$jj"
  }.mkString(",\n    ")
  private val simhashFpSql = (0 until SimhashBits).map { jj =>
    s"(CASE WHEN v$jj > 0 THEN CAST(${1L << jj} AS BIGINT) ELSE 0 END)"
  }.mkString(" + ")

  private val embNormSql =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)""".stripMargin

  /** LSH (table, bucket) index CTE — the SQL twin of
    * [[Similarity.lshTopK]]'s bucketing at the default 8 tables × 6
    * planes over 64-dim vectors. The hyperplanes are DETERMINISTIC
    * (hash-seeded, [[graft.functions.LshSupport.planeMatrix]]), so the
    * whole LSH pipeline is exactly reproducible in DuckDB: each plane
    * is embedded as a 64-double literal and bit p of the bucket is
    * sign(dot(v, plane)). This upgrades the LSH queries from
    * rows-only/recall-in-ScalaTest to full exact-match oracles.
    */
  private val AnnPlanes = 6
  private val AnnTables = 8
  private val EmbDim = 64
  private lazy val lshIndexSql: String = {
    val planes = graft.functions.LshSupport.planeMatrix(AnnPlanes, AnnTables, EmbDim)
    (0 until AnnTables).map { t =>
      val bits = (0 until AnnPlanes).map { p =>
        val lits = planes(t * AnnPlanes + p).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, CAST($lits AS DOUBLE[])) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString("\n      + ")
      s"SELECT vec_id, $t AS tbl,\n      $bits AS bucket FROM n"
    }.mkString("idx AS (\n  ", "\n  UNION ALL\n  ", ")")
  }

  /** PQ shared CTEs — the SQL twin of [[Similarity.pqCodebooks]] +
    * [[Similarity.pqEncode]] at the registry sizing (m=4 sub-spaces ×
    * 16 dims, ks=16 codes): `nn` L2-normalizes with the zero-norm
    * guard, `cb` hash-orders the first 16 corpus vectors (same
    * selection as q_ann_ivf's centroids), `sub` slices codewords, and
    * `codes` replays the argmin encode with the identical
    * (distance asc, j asc) first-minimum tie-break. Expects
    * [[embNormSql]]'s `n` in scope.
    */
  private val PqM = 4
  private val PqKs = 16
  private val PqSubDim = EmbDim / PqM
  /** PQ base CTEs (normalized corpus `nn`, codebooks `cb`/`sub`,
    * per-vector `codes`, per-query `lut`) — shared by the PQ oracles
    * and the IVF-PQ composition, which restricts the ADC differently.
    */
  private lazy val pqBaseSql: String = {
    val sliceQ = s"q.v[(sub.s*$PqSubDim+1):((sub.s+1)*$PqSubDim)]"
    s"""nn AS (SELECT vec_id,
       |    CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END AS v
       |  FROM n),
       |cb AS (
       |  SELECT CASE WHEN nrm = 0 THEN v ELSE list_transform(v, x -> x / nrm) END AS v,
       |    cid AS j
       |  FROM (
       |    SELECT v, nrm,
       |      CAST(row_number() OVER (
       |        ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id) AS INT) - 1 AS cid
       |    FROM n) WHERE cid < $PqKs),
       |sub AS (SELECT j, CAST(s AS INT) AS s,
       |    v[(s*$PqSubDim+1):((s+1)*$PqSubDim)] AS c
       |  FROM cb CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s)),
       |codes AS (
       |  SELECT vec_id, s, j AS code FROM (
       |    SELECT q.vec_id, sub.s, sub.j,
       |      row_number() OVER (PARTITION BY q.vec_id, sub.s
       |        ORDER BY list_dot_product(sub.c, sub.c)
       |          - 2 * list_dot_product($sliceQ, sub.c) ASC,
       |          sub.j ASC) AS rn
       |    FROM nn q CROSS JOIN sub)
       |  WHERE rn = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, sub.s, sub.j,
       |    list_dot_product($sliceQ, sub.c) AS dp
       |  FROM nn q CROSS JOIN sub WHERE q.vec_id < 10)""".stripMargin
  }

  /** ADC pivot + ranking from a `contrib` CTE — shared tail. */
  private val pqRankSql: String =
    """piv AS (
      |  SELECT query_id, id,
      |    max(CASE WHEN s = 0 THEN dp END) AS d0,
      |    max(CASE WHEN s = 1 THEN dp END) AS d1,
      |    max(CASE WHEN s = 2 THEN dp END) AS d2,
      |    max(CASE WHEN s = 3 THEN dp END) AS d3
      |  FROM contrib GROUP BY query_id, id),
      |scored AS (SELECT query_id, id, ((d0 + d1) + d2) + d3 AS approx FROM piv),
      |pqr AS (SELECT query_id, id, approx,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY approx DESC, id ASC) AS INT) AS rank
      |  FROM scored)""".stripMargin

  /** Unrestricted ADC (every corpus code scanned) + ranking. */
  private lazy val pqAdcTailSql: String =
    s"""contrib AS (
       |  SELECT l.query_id, c.vec_id AS id, l.s, l.dp
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
       |  WHERE c.vec_id <> l.query_id),
       |$pqRankSql""".stripMargin

  private lazy val pqCodesSql: String =
    s"$pqBaseSql,\n$pqAdcTailSql"

  private val langScoreSql = TextAnalysis.langMarkers.map { case (lang, ms) =>
    val lst = ms.map(m => s"'$m'").mkString(", ")
    s"CAST(len(list_filter(ws, t -> t IN ($lst))) AS INT) AS score_$lang"
  }.mkString(",\n    ")
  private val langPredSql = {
    val g = TextAnalysis.langMarkers.map(m => s"score_${m._1}").mkString(", ")
    TextAnalysis.langMarkers.map { case (lang, _) =>
      s"WHEN score_$lang = greatest($g) THEN '$lang'"
    }.mkString("CASE ", " ", " END")
  }

  /** IVF cell CTEs (hash-picked 16 centroids, cosine assignment,
    * nProbe=2 probes for the <10 query set) — shared by q_ann_ivf and
    * the IVF-PQ composition.
    */
  private lazy val ivfCellsSql: String =
    s"""cent AS (
       |  SELECT v, nrm, cid FROM (
       |    SELECT v, nrm,
       |      CAST(row_number() OVER (
       |        ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id) AS INT) - 1 AS cid
       |    FROM n) WHERE cid < 16),
       |asgn AS (
       |  SELECT id, cell FROM (
       |    SELECT n.vec_id AS id, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.v, cent.v) / (n.nrm * cent.nrm) DESC,
       |                 cent.cid ASC) AS rn
       |    FROM n CROSS JOIN cent) WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT n.vec_id AS query_id, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_dot_product(n.v, cent.v) / (n.nrm * cent.nrm) DESC,
       |                 cent.cid ASC) AS rn
       |    FROM n CROSS JOIN cent WHERE n.vec_id < 10) WHERE rn <= 2)""".stripMargin

  // ---- the registry --------------------------------------------------

  /** Blocking + candidate CTE shared by the entity-resolution oracle
    * pair — the SQL twin of [[graft.ops.EntityResolution.fuzzyJoin]]
    * with [[graft.ops.EntityResolution.DefaultBlockers]].
    */
  private val erCandSql: String =
    """clean AS (SELECT doc_id AS id_r, substr(text, 1, 40) AS kc FROM documents),
      |dirty AS (SELECT doc_id AS id_l,
      |    regexp_replace(substr(text, 1, 40), '(.{9}).', '\1', 'g') AS kd
      |  FROM documents WHERE doc_id % 3 = 0),
      |cand AS (
      |  SELECT id_l, id_r, kd, kc FROM dirty JOIN clean
      |    ON substr(kd, 1, 2) = substr(kc, 1, 2)
      |  UNION
      |  SELECT id_l, id_r, kd, kc FROM dirty JOIN clean
      |    ON substr(kd, -2, 2) = substr(kc, -2, 2))""".stripMargin

  private val erMatchSql: String =
    s"""WITH $erCandSql
       |SELECT id_l, id_r, round(jaro_winkler_similarity(kd, kc), 6) AS sim
       |FROM cand WHERE jaro_winkler_similarity(kd, kc) >= 0.9""".stripMargin

  // ---- Z-order layout twins ([[graft.ops.Layout]]) -----------------
  private val ZBits = 10
  private val ZCellBits = 6

  /** Morton interleave of the low [[ZBits]] bits — SQL twin of
    * [[graft.ops.Layout.zValue]].
    */
  private val zInterleaveSql: String = (0 until ZBits).map { i =>
    s"((((zx >> $i) & 1) << ${2 * i + 1}) + (((zy >> $i) & 1) << ${2 * i}))"
  }.mkString(" + ")

  /** CTE `zc`: lineitem with its Z-cell (normalize both keys off the
    * corpus min/max, interleave, keep the top [[ZCellBits]] bits) —
    * SQL twin of [[graft.ops.Layout.zorderCellStats]]'s assignment.
    */
  private val zCellsSql: String =
    s"""zs AS (SELECT CAST(min(l_partkey) AS BIGINT) AS minx,
       |    CAST(max(l_partkey) AS BIGINT) AS maxx,
       |    CAST(min(l_suppkey) AS BIGINT) AS miny,
       |    CAST(max(l_suppkey) AS BIGINT) AS maxy FROM lineitem),
       |zn AS (SELECT l_partkey, l_suppkey,
       |    CAST(floor((l_partkey - minx) * ${1L << ZBits} / (maxx - minx + 1)) AS BIGINT) AS zx,
       |    CAST(floor((l_suppkey - miny) * ${1L << ZBits} / (maxy - miny + 1)) AS BIGINT) AS zy
       |  FROM lineitem, zs),
       |zc AS (SELECT l_partkey, l_suppkey,
       |    ($zInterleaveSql) >> ${2 * ZBits - ZCellBits} AS cell FROM zn)""".stripMargin

  /** Three-rung batch admission (exact-novel ∖ substring-hit ∖
    * fuzzy-hit), unordered — shared by q_admit_ladder and the
    * four-rung q_admit_full (which anti-joins the embedding rung on
    * top; vec_id is doc-aligned in the fixtures).
    */
  private def admitLadder3(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bucket = TrainingData.splitBucket(col("doc_id"), 1000)
    val seen = d.filter(bucket < 500)
    val slice = d.filter(bucket >= 500 && bucket < 600)
    val probe = coalesce(
      Dedup.bloomProbeEager(seen, "text", expectedSeen = 1000L, fpp = 0.01),
      lit(false))
    val survivors = slice.filter(col("text").isNull || !probe)
    val maybes = slice.filter(col("text").isNotNull && probe)
    val seenDigests = seen.select(md5(col("text")).as("digest")).distinct()
    val recovered = maybes.withColumn("digest", md5(col("text")))
      .join(seenDigests, Seq("digest"), "left_anti")
      .drop("digest")
    val exactNovel = survivors.unionByName(recovered)
    val corpusSpans = Dedup.spanHashIndex(seen, "doc_id", "text", 8)
      .select("h").distinct()
    val substrHits = Dedup.spanHashIndex(slice, "doc_id", "text", 8)
      .join(corpusSpans, Seq("h"), "left_semi")
      .select(col("id").as("doc_id")).distinct()
    val fuzzyHits = Dedup.minhashCrossPairs(seen, slice, "doc_id", "text")
      .select(col("new_id").as("doc_id")).distinct()
    exactNovel.join(substrHits, Seq("doc_id"), "left_anti")
      .join(fuzzyHits, Seq("doc_id"), "left_anti")
      .select("doc_id")
  }

  /** SQL twin of [[admitLadder3]]: the CTE stack (assumes
    * [[shinglesSql]]/[[minhashSql]]/[[bandsSql]] precede it in the
    * same WITH) and the admit predicate, split so q_admit_full can
    * append the embedding rung before the final SELECT.
    */
  private lazy val admitLadderCtes: String =
    s"""exact_novel AS (
       |  SELECT s.doc_id FROM documents s
       |  WHERE ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 >= 500
       |    AND ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 < 600
       |    AND NOT EXISTS (
       |      SELECT 1 FROM documents c
       |      WHERE ${h60("CAST(c.doc_id AS VARCHAR)")} % 1000 < 500
       |        AND md5(c.text) = md5(s.text))),
       |wv AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |spv AS (SELECT doc_id,
       |    unnest(list_transform(range(0, greatest(len(ws) - 7, 0)),
       |      i -> ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")})) AS h
       |  FROM wv),
       |csx AS (SELECT DISTINCT h FROM spv
       |        WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 500),
       |substr_hit AS (
       |  SELECT DISTINCT doc_id FROM spv
       |  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 >= 500
       |    AND ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 600
       |    AND h IN (SELECT h FROM csx)),
       |cb AS (SELECT id, band, bh FROM bands
       |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 < 500),
       |nb AS (SELECT id, band, bh FROM bands
       |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 >= 500
       |         AND ${h60("CAST(id AS VARCHAR)")} % 1000 < 600),
       |cand AS (
       |  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
       |  FROM cb c JOIN nb n
       |    ON c.band = n.band AND c.bh = n.bh AND c.id <> n.id),
       |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       |shared AS (
       |  SELECT new_id, corpus_id, count(*) AS shared
       |  FROM cand JOIN sh a ON new_id = a.id
       |            JOIN sh b ON corpus_id = b.id AND a.h = b.h
       |  GROUP BY 1, 2),
       |fuzzy AS (
       |  SELECT DISTINCT new_id FROM shared
       |  JOIN sz sn ON new_id = sn.id JOIN sz sc ON corpus_id = sc.id
       |  WHERE CAST(shared AS DOUBLE) / (sn.n + sc.n - shared) >= 0.5)""".stripMargin

  private val admitLadderPredicate: String =
    """SELECT doc_id FROM exact_novel
      |WHERE doc_id NOT IN (SELECT doc_id FROM substr_hit)
      |  AND doc_id NOT IN (SELECT new_id FROM fuzzy)""".stripMargin

  /** Embedding-rung hit ids (cosine ≥ 0.35 among any-table LSH bucket
    * collisions, vec_id doc-aligned) — shared by q_admit_full and the
    * five-rung pipeline faces.
    */
  private def embedHitIds(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.LshFunctions.lsh_buckets
    val e = emb(s, dir)
    val ebucket = TrainingData.splitBucket(col("vec_id"), 1000)
    val cN = Similarity.withNorm(e.filter(ebucket < 500)
      .select(col("vec_id"), col("embedding").as("vec")))
    val nN = Similarity.withNorm(e.filter(ebucket >= 500 && ebucket < 600)
      .select(col("vec_id"), col("embedding").as("vec")))
    def idx(df: DataFrame) = df.select(col("vec_id"),
      posexplode(lsh_buckets(col("vec"), 6, 8, 64))
        .as(Seq("table", "bucket")))
    idx(nN).as("n")
      .join(idx(cN).as("c"),
        col("n.table") === col("c.table") &&
          col("n.bucket") === col("c.bucket") &&
          col("n.vec_id") =!= col("c.vec_id"))
      .select(col("n.vec_id").as("vec_id"), col("c.vec_id").as("cid"))
      .distinct()
      .join(nN.select(col("vec_id"), col("vec").as("nv"),
        col("norm").as("nn")), Seq("vec_id"))
      .join(cN.select(col("vec_id").as("cid"), col("vec").as("cv"),
        col("norm").as("cn")), Seq("cid"))
      .filter(Similarity.cosineFromNorms(
        col("nv"), col("cv"), col("nn"), col("cn")) >= 0.35)
      .select(col("vec_id").as("doc_id")).distinct()
  }

  /** SQL twin of [[embedHitIds]] (assumes [[embNormSql]] +
    * [[lshIndexSql]] precede it in the same WITH).
    */
  private lazy val embedHitCtes: String =
    s"""ce AS (SELECT vec_id, tbl, bucket FROM idx
       |       WHERE ${h60("CAST(vec_id AS VARCHAR)")} % 1000 < 500),
       |ne AS (SELECT vec_id, tbl, bucket FROM idx
       |       WHERE ${h60("CAST(vec_id AS VARCHAR)")} % 1000 >= 500
       |         AND ${h60("CAST(vec_id AS VARCHAR)")} % 1000 < 600),
       |ecand AS (
       |  SELECT DISTINCT ne.vec_id AS new_id, ce.vec_id AS corpus_id
       |  FROM ce JOIN ne
       |    ON ce.tbl = ne.tbl AND ce.bucket = ne.bucket
       |      AND ce.vec_id <> ne.vec_id),
       |embed_hit AS (
       |  SELECT DISTINCT new_id AS doc_id FROM ecand
       |  JOIN n na ON new_id = na.vec_id JOIN n nc ON corpus_id = nc.vec_id
       |  WHERE list_dot_product(na.v, nc.v) / (na.nrm * nc.nrm) >= 0.35)""".stripMargin

  val all: Seq[Q] = Seq(

    // Exact dedup: canonical id per distinct content digest.
    Q("q_dedup_exact",
      (s, dir) => Dedup.exactDedup(docs(s, dir), "doc_id", "text")
        .orderBy("text_hash"),
      Some("""SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
             |  count(*) AS n_docs
             |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin)),

    // Semi-join survivors of exact dedup: full rows, min-id winner per
    // distinct text (the "drop duplicates keep one" shape).
    Q("q_dedup_survivors",
      (s, dir) => Dedup.exactDedupSurvivors(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""SELECT * FROM documents
             |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
             |ORDER BY doc_id""".stripMargin)),

    // Incremental dedup against an already-processed corpus
    // (Dedup.unseenByBloom): the broadcast-Bloom filter path — NO join,
    // NO shuffle on the new side. Bloom bit patterns are
    // engine-specific, so the oracle pins the filter's CONTRACT per
    // row instead of its survivors: for every new doc, the exact
    // seen/unseen verdict (DuckDB replays the digest semi-join) plus
    // no_false_negative = "kept ⇒ genuinely unseen" — Bloom filters
    // cannot have false negatives, so any seen doc surviving the filter
    // flips its row to false and hash-mismatches. The FP drop rate
    // (≤ ~2·fpp of genuinely-new docs) is asserted in ModelsSpec.
    // Split: seen = hash-bucket < 500 of doc_id (same md5 formula as
    // q_hash_sample), new = the rest.
    Q("q_dedup_incremental",
      (s, dir) => {
        val d = docs(s, dir)
        val isSeen = TrainingData.splitBucket(col("doc_id"), 1000) < 500
        val seen = d.filter(isSeen)
        val fresh = d.filter(!isSeen)
        val kept = Dedup.unseenByBloom(fresh, seen, "doc_id", "text",
          expectedSeen = 1000L, fpp = 0.01)
        val seenDigests = seen.select(md5(col("text")).as("digest")).distinct()
          .withColumn("seen_exact", lit(true))
        fresh.withColumn("digest", md5(col("text")))
          .join(kept.select(col("doc_id"), lit(true).as("kept")), Seq("doc_id"), "left")
          .join(seenDigests, Seq("digest"), "left")
          .select(col("doc_id"),
            coalesce(col("seen_exact"), lit(false)).as("seen_exact"),
            (!(coalesce(col("seen_exact"), lit(false)) &&
              coalesce(col("kept"), lit(false)))).as("no_false_negative"))
          .orderBy("doc_id")
      },
      Some(s"""WITH seen AS (
              |  SELECT DISTINCT md5(text) AS digest FROM documents
              |  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 500)
              |SELECT doc_id,
              |  md5(text) IN (SELECT digest FROM seen) AS seen_exact,
              |  TRUE AS no_false_negative
              |FROM documents
              |WHERE NOT (${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 500)
              |ORDER BY doc_id""".stripMargin)),

    // Canonical normalization for case/punct-insensitive dedup keys.
    Q("q_normalize",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.normalize(col("text")).as("norm_text"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(lower(text),
             |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs via the inverted shingle index.
    Q("q_dedup_ngram",
      (s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text")
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shinglesSql,
              |shp AS (SELECT * FROM sh),
              |$jaccardTailSql""".stripMargin)),

    // MinHash + LSH banding + exact-Jaccard verification.
    Q("q_dedup_minhash",
      (s, dir) => Dedup.minhashDedupPairs(docs(s, dir), "doc_id", "text")
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |cand AS (
              |  SELECT DISTINCT a.id AS ca, b.id AS cb
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
              |shp AS (SELECT sh.* FROM sh
              |        WHERE id IN (SELECT ca FROM cand) OR id IN (SELECT cb FROM cand)),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT ca AS ia, cb AS ib, count(*) AS shared
              |  FROM cand JOIN shp a ON ca = a.id
              |            JOIN shp b ON cb = b.id AND a.h = b.h
              |  GROUP BY 1, 2)
              |SELECT ia AS id_a, ib AS id_b,
              |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
              |FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
              |WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
              |ORDER BY id_a, id_b""".stripMargin)),

    // Incremental cross-set fuzzy dedup: a hash-sampled 10% "new
    // crawl slice" banded against the full corpus index, slice side
    // broadcast — the daily-ingestion admission check.
    Q("q_dedup_cross",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.minhashCrossPairs(d,
            TrainingData.hashSample(d, col("doc_id"), 100),
            "doc_id", "text")
          .withColumn("jaccard", round(col("jaccard"), 6))
          .orderBy("new_id", "corpus_id")
      },
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |nb AS (SELECT id, band, bh FROM bands
              |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 < 100),
              |cand AS (
              |  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
              |  FROM bands c JOIN nb n
              |    ON c.band = n.band AND c.bh = n.bh AND c.id <> n.id),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT new_id, corpus_id, count(*) AS shared
              |  FROM cand JOIN sh a ON new_id = a.id
              |            JOIN sh b ON corpus_id = b.id AND a.h = b.h
              |  GROUP BY 1, 2)
              |SELECT new_id, corpus_id,
              |  round(CAST(shared AS DOUBLE) / (sn.n + sc.n - shared), 6) AS jaccard
              |FROM shared JOIN sz sn ON new_id = sn.id JOIN sz sc ON corpus_id = sc.id
              |WHERE CAST(shared AS DOUBLE) / (sn.n + sc.n - shared) >= 0.5
              |ORDER BY new_id, corpus_id""".stripMargin)),

    // Admission face — the full ingest-gate composition a training
    // pipeline runs per fresh slice: (1) EXACT stage with the Bloom as
    // a pre-gate, not the decider — bloom-negative docs are admitted
    // outright (false negatives impossible, zero shuffle), and only
    // the bloom-POSITIVE maybes pay the exact digest anti-join, which
    // recovers the false positives, so the exact stage's result is
    // precisely "text not present in the corpus" and replays in SQL;
    // (2) FUZZY stage — minhashCrossPairs (LSH-banded candidates +
    // exact Jaccard verify, jaccard ≥ 0.5) rejects near-dups of the
    // corpus. Emits the admitted (novel) doc ids.
    Q("q_admit_slice",
      (s, dir) => {
        val d = docs(s, dir)
        val bucket = TrainingData.splitBucket(col("doc_id"), 1000)
        val seen = d.filter(bucket < 500)
        val slice = d.filter(bucket >= 500 && bucket < 600)
        // ONE EAGER probe for both directions of the split —
        // complement FILTERS, not slice-anti-join-survivors (no
        // shuffle of the slice), and the corpus-scanning Bloom build
        // runs exactly once (a scalar-subquery probe is planned per
        // referencing branch: measured 4 independent builds here)
        val probe = coalesce(
          Dedup.bloomProbeEager(seen, "text", expectedSeen = 1000L, fpp = 0.01),
          lit(false))
        val survivors = slice.filter(col("text").isNull || !probe)
        val maybes = slice.filter(col("text").isNotNull && probe)
        val seenDigests = seen.select(md5(col("text")).as("digest")).distinct()
        val recovered = maybes.withColumn("digest", md5(col("text")))
          .join(seenDigests, Seq("digest"), "left_anti")
          .drop("digest")
        val exactNovel = survivors.unionByName(recovered)
        val fuzzyHits = Dedup.minhashCrossPairs(seen, slice, "doc_id", "text")
          .select(col("new_id").as("doc_id")).distinct()
        exactNovel.join(fuzzyHits, Seq("doc_id"), "left_anti")
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |exact_novel AS (
              |  SELECT s.doc_id FROM documents s
              |  WHERE ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 >= 500
              |    AND ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 < 600
              |    AND NOT EXISTS (
              |      SELECT 1 FROM documents c
              |      WHERE ${h60("CAST(c.doc_id AS VARCHAR)")} % 1000 < 500
              |        AND md5(c.text) = md5(s.text))),
              |cb AS (SELECT id, band, bh FROM bands
              |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 < 500),
              |nb AS (SELECT id, band, bh FROM bands
              |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 >= 500
              |         AND ${h60("CAST(id AS VARCHAR)")} % 1000 < 600),
              |cand AS (
              |  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
              |  FROM cb c JOIN nb n
              |    ON c.band = n.band AND c.bh = n.bh AND c.id <> n.id),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT new_id, corpus_id, count(*) AS shared
              |  FROM cand JOIN sh a ON new_id = a.id
              |            JOIN sh b ON corpus_id = b.id AND a.h = b.h
              |  GROUP BY 1, 2),
              |fuzzy AS (
              |  SELECT DISTINCT new_id FROM shared
              |  JOIN sz sn ON new_id = sn.id JOIN sz sc ON corpus_id = sc.id
              |  WHERE CAST(shared AS DOUBLE) / (sn.n + sc.n - shared) >= 0.5)
              |SELECT doc_id FROM exact_novel
              |WHERE doc_id NOT IN (SELECT new_id FROM fuzzy)
              |ORDER BY doc_id""".stripMargin)),

    // The FULL admission ladder as one query — README's ingest
    // blueprint end to end: eager-Bloom exact stage (complement
    // filters + digest anti-join), verbatim-substring stage (span
    // semi-probe), fuzzy stage (LSH band + Jaccard verify). Admitted
    // = exact-novel minus substring hits minus fuzzy hits.
    Q("q_admit_ladder",
      (s, dir) => admitLadder3(s, dir).orderBy("doc_id"),
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |$admitLadderCtes
              |$admitLadderPredicate
              |ORDER BY doc_id""".stripMargin)),

    // FOUR-rung batch admission — the text ladder plus the embedding
    // rung (vec_id is doc-aligned in the fixtures): admitted =
    // exact-novel MINUS substring-hit MINUS fuzzy-hit MINUS embed-hit;
    // embed-hit is the LSH bucket-join + exact-cosine slice the
    // streaming gate replays. The complete ingest decision: verbatim,
    // lifted-passage, near-dup, AND paraphrased leakage all gated in
    // one composition, still zero corpus self-shuffles.
    Q("q_admit_full",
      (s, dir) =>
        admitLadder3(s, dir)
          .join(embedHitIds(s, dir), Seq("doc_id"), "left_anti")
          .orderBy("doc_id"),
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |$admitLadderCtes,
              |$embNormSql,
              |$lshIndexSql,
              |$embedHitCtes
              |$admitLadderPredicate
              |  AND doc_id NOT IN (SELECT doc_id FROM embed_hit)
              |ORDER BY doc_id""".stripMargin)),

    // Streaming twin of the admission face's EXACT stage: the fresh
    // slice arrives as micro-batches; corpus Bloom (eager literal) +
    // stream-static LEFT ANTI digest join admit exactly the docs
    // whose text is not in the corpus — the same SQL predicate the
    // batch face replays, so the gate is oracle-exact (the fuzzy
    // stage stays batch: LSH banding is an offline index build).
    Q("q_stream_admit",
      (s, dir) => graft.streaming.StreamingGate.streamAdmitFromFiles(s, dir),
      Some(s"""SELECT s.doc_id FROM documents s
              |WHERE ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 >= 500
              |  AND ${h60("CAST(s.doc_id AS VARCHAR)")} % 1000 < 600
              |  AND NOT EXISTS (
              |    SELECT 1 FROM documents c
              |    WHERE ${h60("CAST(c.doc_id AS VARCHAR)")} % 1000 < 500
              |      AND md5(c.text) = md5(s.text))
              |ORDER BY doc_id""".stripMargin)),

    // Model rung of the admission ladder, batch face: NB weights
    // trained on the corpus half (QualityModel.nbWeightsMicro — the
    // train-offline/ship artifact), fresh slice filtered by the
    // row-local integer micro-llr fold (admitByModel). Exact BIGINT
    // arithmetic end-to-end, so the oracle replays the entire model
    // in SQL: teacher labels → per-term class counts → one rounded
    // micro-llr per term → per-doc exact sum > 0.
    Q("q_quality_gate",
      (s, dir) => {
        val d = docs(s, dir)
        val bucket = TrainingData.splitBucket(col("doc_id"), 1000)
        val weights = QualityModel.nbWeightsMicro(d.filter(bucket < 500), "doc_id", "text")
        QualityModel.admitByModel(
            d.filter(bucket >= 500 && bucket < 600).select("doc_id", "text"),
            weights)
          .select("doc_id").orderBy("doc_id")
      },
      Some(qualityGateSql)),

    // Streaming twin of the model rung: the same shipped weight map
    // filters each arriving micro-batch (stateless pure projection —
    // no state, no join), so the admitted set must equal the batch
    // face bit-for-bit; same oracle.
    Q("q_stream_admit_quality",
      (s, dir) => graft.streaming.StreamingGate.streamAdmitQualityFromFiles(s, dir),
      Some(qualityGateSql)),

    // Streaming twin of the admission face's FUZZY stage: per-batch
    // row-local MinHash banding, stream-static (band, band_hash)
    // candidate join against the batch-built corpus band index,
    // exact-Jaccard verify — emits the fuzzy-hit doc set, which must
    // equal q_admit_slice's batch minhashCrossPairs stage (the
    // oracle). Composing with q_stream_admit's exact gate yields the
    // full streaming ingest admission.
    Q("q_stream_admit_fuzzy",
      (s, dir) => graft.streaming.StreamingGate.streamAdmitFuzzyFromFiles(s, dir),
      Some(s"""WITH $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |cb AS (SELECT id, band, bh FROM bands
              |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 < 500),
              |nb AS (SELECT id, band, bh FROM bands
              |       WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 >= 500
              |         AND ${h60("CAST(id AS VARCHAR)")} % 1000 < 600),
              |cand AS (
              |  SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
              |  FROM cb c JOIN nb n
              |    ON c.band = n.band AND c.bh = n.bh AND c.id <> n.id),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT new_id, corpus_id, count(*) AS shared
              |  FROM cand JOIN sh a ON new_id = a.id
              |            JOIN sh b ON corpus_id = b.id AND a.h = b.h
              |  GROUP BY 1, 2)
              |SELECT DISTINCT new_id AS doc_id FROM shared
              |JOIN sz sn ON new_id = sn.id JOIN sz sc ON corpus_id = sc.id
              |WHERE CAST(shared AS DOUBLE) / (sn.n + sc.n - shared) >= 0.5
              |ORDER BY doc_id""".stripMargin)),

    // Middle rung of the streaming admission ladder: per-batch
    // row-local stride-1 window hashing + stream-static LEFT SEMI
    // against the corpus span-hash set — flags slice docs sharing ≥1
    // verbatim 8-word window with the corpus (exact digest misses a
    // lifted paragraph; fuzzy banding needs global similarity).
    Q("q_stream_admit_substring",
      (s, dir) => graft.streaming.StreamingGate.streamAdmitSubstringFromFiles(s, dir),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              |sp AS (SELECT doc_id,
              |    unnest(list_transform(range(0, greatest(len(ws) - 7, 0)),
              |      i -> ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")})) AS h
              |  FROM w),
              |cs AS (SELECT DISTINCT h FROM sp
              |       WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 500)
              |SELECT DISTINCT doc_id FROM sp
              |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 >= 500
              |  AND ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 600
              |  AND h IN (SELECT h FROM cs)
              |ORDER BY doc_id""".stripMargin)),

    // Drift monitoring ON the ingest stream: running fixed-width
    // histogram of the arriving slice (update-mode streaming agg,
    // state = the 16-bucket histogram), final counts vs the
    // batch-built corpus reference through the SAME PSI tail as
    // q_drift. The oracle replays the split + bucketing + PSI in SQL.
    Q("q_stream_drift",
      (s, dir) => graft.streaming.StreamingGate.streamDriftFromFiles(s, dir),
      Some(s"""WITH ref AS (
              |  SELECT least(15, CAST(n_chars // 64 AS INT)) AS bucket,
              |    count(*) AS cnt_ref
              |  FROM documents
              |  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 500
              |    AND n_chars IS NOT NULL
              |  GROUP BY 1),
              |cur AS (
              |  SELECT least(15, CAST(n_chars // 64 AS INT)) AS bucket,
              |    count(*) AS cnt_cur
              |  FROM documents
              |  WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 >= 500
              |    AND ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 600
              |    AND n_chars IS NOT NULL
              |  GROUP BY 1),
              |tr AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS t_ref FROM ref),
              |tc AS (SELECT CAST(sum(cnt_cur) AS BIGINT) AS t_cur FROM cur),
              |j AS (
              |  SELECT coalesce(r.bucket, c.bucket) AS bucket,
              |    coalesce(r.cnt_ref, 0) AS cnt_ref,
              |    coalesce(c.cnt_cur, 0) AS cnt_cur
              |  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket)
              |SELECT CAST(bucket AS INT) AS bucket, cnt_ref, cnt_cur,
              |  round(CAST(cnt_ref AS DOUBLE) / t_ref, 6) AS p_ref,
              |  round(CAST(cnt_cur AS DOUBLE) / t_cur, 6) AS p_cur,
              |  round((CAST(cnt_ref AS DOUBLE) / t_ref - CAST(cnt_cur AS DOUBLE) / t_cur)
              |    * ln(greatest(CAST(cnt_ref AS DOUBLE) / t_ref, 1e-6)
              |        / greatest(CAST(cnt_cur AS DOUBLE) / t_cur, 1e-6)), 6) AS psi_term
              |FROM j CROSS JOIN tr CROSS JOIN tc
              |ORDER BY bucket""".stripMargin)),

    // Vector rung of the streaming admission ladder: per-batch
    // row-local norm + LSH bucketing (deterministic plane family),
    // stream-static (table, bucket) candidate join against the
    // batch-built corpus bucket index, exact-cosine verify — flags
    // slice vectors within cosine 0.35 of any corpus vector they
    // collide with (paraphrased near-dups share no shingles; this is
    // the rung the text gates can't see). Oracle replays the planes
    // literal-for-literal like q_embed_neardup_lsh.
    Q("q_stream_admit_embed",
      (s, dir) => graft.streaming.StreamingGate.streamAdmitEmbedFromFiles(s, dir),
      Some(s"""WITH $embNormSql,
              |$lshIndexSql,
              |ci AS (SELECT vec_id, tbl, bucket FROM idx
              |       WHERE ${h60("CAST(vec_id AS VARCHAR)")} % 1000 < 500),
              |ni AS (SELECT vec_id, tbl, bucket FROM idx
              |       WHERE ${h60("CAST(vec_id AS VARCHAR)")} % 1000 >= 500
              |         AND ${h60("CAST(vec_id AS VARCHAR)")} % 1000 < 600),
              |cand AS (
              |  SELECT DISTINCT ni.vec_id AS new_id, ci.vec_id AS corpus_id
              |  FROM ci JOIN ni
              |    ON ci.tbl = ni.tbl AND ci.bucket = ni.bucket
              |      AND ci.vec_id <> ni.vec_id)
              |SELECT DISTINCT new_id AS vec_id FROM cand
              |JOIN n na ON new_id = na.vec_id JOIN n nc ON corpus_id = nc.vec_id
              |WHERE list_dot_product(na.v, nc.v) / (na.nrm * nc.nrm) >= 0.35
              |ORDER BY vec_id""".stripMargin)),

    // Directed containment pairs — the asymmetric near-dup Jaccard
    // misses (short doc embedded in a long one). τ = 0.6 over the
    // bigger of the two directions.
    Q("q_containment",
      (s, dir) => Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
          minContainment = 0.6)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $shinglesSql,
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT a.id AS ia, b.id AS ib, count(*) AS shared
              |  FROM sh a JOIN sh b ON a.h = b.h AND a.id < b.id
              |  GROUP BY 1, 2)
              |SELECT ia AS id_a, ib AS id_b,
              |  round(CAST(shared AS DOUBLE) / sa.n, 6) AS cont_a,
              |  round(CAST(shared AS DOUBLE) / sb.n, 6) AS cont_b
              |FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
              |WHERE greatest(CAST(shared AS DOUBLE) / sa.n,
              |               CAST(shared AS DOUBLE) / sb.n) >= 0.6
              |ORDER BY id_a, id_b""".stripMargin)),

    // Benchmark decontamination: the 20% hash sample stands in as the
    // "eval set"; any corpus doc sharing ≥ 8 distinct shingles with a
    // benchmark doc is reported (self-matches excluded — the benchmark
    // is drawn from the corpus here).
    Q("q_decontaminate",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.contaminationReport(d, "doc_id", "text",
            TrainingData.hashSample(d, col("doc_id"), 200), "doc_id", "text",
            minShared = 8, excludeSameId = true)
          .orderBy("id", "bench_id")
      },
      Some(s"""WITH $shinglesSql,
              |b AS (SELECT id AS bench_id, h FROM sh
              |      WHERE ${h60("CAST(id AS VARCHAR)")} % 1000 < 200)
              |SELECT sh.id, b.bench_id, count(*) AS shared
              |FROM sh JOIN b USING (h)
              |WHERE sh.id <> b.bench_id
              |GROUP BY 1, 2 HAVING count(*) >= 8
              |ORDER BY id, bench_id""".stripMargin)),

    // Transitive near-dup clusters over the MinHash+LSH verified pairs
    // — the "A≈B≈C dedups as one group" step. Spark runs min-label
    // propagation (one join + one agg per round); the oracle computes
    // the same components with a recursive CTE (min reachable id).
    Q("q_dedup_clusters",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.nearDupClusters(
            d.select(col("doc_id").as("id")),
            Dedup.minhashDedupEdges(d, "doc_id", "text"))
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |cand AS (
              |  SELECT DISTINCT a.id AS ca, b.id AS cb
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
              |shp AS (SELECT sh.* FROM sh
              |        WHERE id IN (SELECT ca FROM cand) OR id IN (SELECT cb FROM cand)),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT ca AS ia, cb AS ib, count(*) AS shared
              |  FROM cand JOIN shp a ON ca = a.id
              |            JOIN shp b ON cb = b.id AND a.h = b.h
              |  GROUP BY 1, 2),
              |p AS (
              |  SELECT ia AS id_a, ib AS id_b
              |  FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
              |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM p
              |  UNION ALL SELECT id_b, id_a FROM p),
              |reach(id, lab) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.id = e.src)
              |SELECT id, min(lab) AS cluster FROM reach GROUP BY id
              |ORDER BY id""".stripMargin)),

    // Quality-aware survivor selection over the near-dup clusters:
    // keep per cluster the member with max n_chars (ties → min id) —
    // the "cluster near-duplicates, keep the best copy" production
    // step (Dedup.clusterSurvivors). The oracle replays the full
    // clustering CTE (same fragments as q_dedup_clusters) plus a
    // window argmax.
    Q("q_cluster_survivors",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.clusterSurvivors(d, "doc_id",
            Dedup.nearDupClusters(
              d.select(col("doc_id").as("id")),
              Dedup.minhashDedupEdges(d, "doc_id", "text")),
            "n_chars")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shinglesSql,
              |$minhashSql,
              |$bandsSql,
              |cand AS (
              |  SELECT DISTINCT a.id AS ca, b.id AS cb
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
              |shp AS (SELECT sh.* FROM sh
              |        WHERE id IN (SELECT ca FROM cand) OR id IN (SELECT cb FROM cand)),
              |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
              |shared AS (
              |  SELECT ca AS ia, cb AS ib, count(*) AS shared
              |  FROM cand JOIN shp a ON ca = a.id
              |            JOIN shp b ON cb = b.id AND a.h = b.h
              |  GROUP BY 1, 2),
              |p AS (
              |  SELECT ia AS id_a, ib AS id_b
              |  FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
              |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
              |edges AS (
              |  SELECT id_a AS src, id_b AS dst FROM p
              |  UNION ALL SELECT id_b, id_a FROM p),
              |reach(id, lab) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.id = e.src),
              |cl AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
              |SELECT doc_id, text, lang, source, n_chars FROM (
              |  SELECT d.*, row_number() OVER (
              |      PARTITION BY c.cluster
              |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
              |  FROM documents d JOIN cl c ON d.doc_id = c.id)
              |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // SimHash fingerprints (tf-weighted, 60-bit).
    Q("q_simhash",
      (s, dir) => Dedup.simhash(docs(s, dir), "doc_id", "text")
        .orderBy("id"),
      Some(s"""WITH t AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
              |          FROM documents),
              |h AS (SELECT id, ${h60("tok")} AS h FROM t),
              |v AS (SELECT id,
              |    $simhashVotesSql
              |  FROM h GROUP BY id)
              |SELECT id, $simhashFpSql AS simhash FROM v ORDER BY id""".stripMargin)),

    // Embedding-cosine near-dup — PRIMARY (scale) path: vectors only
    // meet inside an LSH (table, bucket); the corpus never cross-joins.
    // The planes are deterministic, so the oracle replays the exact
    // bucketing in SQL and the comparison is a full hash match, not a
    // subset check. Recall vs the exact pairs is asserted in
    // SimilaritySpec.
    Q("q_embed_neardup_lsh",
      (s, dir) => Similarity.lshNearDupPairs(emb(s, dir), minCos = 0.45)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $embNormSql,
              |$lshIndexSql,
              |cand AS (
              |  SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
              |  FROM idx a JOIN idx b
              |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
              |SELECT ia AS id_a, ib AS id_b,
              |  round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS cos
              |FROM cand JOIN n na ON ia = na.vec_id JOIN n nb ON ib = nb.vec_id
              |WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= 0.45
              |ORDER BY id_a, id_b""".stripMargin)),

    // Semantic decontamination: corpus embeddings within cosine 0.35
    // of a hash-sampled 20% "benchmark" — the embedding-space twin of
    // q_decontaminate (catches paraphrased leakage that shares no
    // shingles). Same deterministic-plane LSH index, benchmark side
    // broadcast; full plane-by-plane oracle replay.
    Q("q_semantic_decontaminate",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.semanticContamination(e,
            TrainingData.hashSample(e, col("vec_id"), 200), minCos = 0.35)
          .orderBy("id", "bench_id")
      },
      Some(s"""WITH $embNormSql,
              |$lshIndexSql,
              |b AS (SELECT vec_id AS bench_id, tbl, bucket FROM idx
              |      WHERE ${h60("CAST(vec_id AS VARCHAR)")} % 1000 < 200),
              |cand AS (
              |  SELECT DISTINCT i.vec_id AS id, b.bench_id
              |  FROM idx i JOIN b
              |    ON i.tbl = b.tbl AND i.bucket = b.bucket
              |      AND i.vec_id <> b.bench_id)
              |SELECT id, bench_id,
              |  round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS cos
              |FROM cand JOIN n na ON id = na.vec_id JOIN n nb ON bench_id = nb.vec_id
              |WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= 0.35
              |ORDER BY id, bench_id""".stripMargin)),

    // FUZZY-DEDUP FINISHER: exact Levenshtein over the SimHash-banded
    // candidates — banding proposes, edit distance disposes; the
    // candidate frame broadcasts so the corpus never shuffles for the
    // verify. Both engines compute the same unit-cost edit distance.
    Q("q_edit_pairs",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.editDistanceVerify(d, "doc_id", "text",
            Dedup.simhashBandedPairs(
              Dedup.simhash(d, "doc_id", "text"), maxDist = 3))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
              |          FROM documents),
              |h AS (SELECT id, ${h60("tok")} AS h FROM t),
              |v AS (SELECT id,
              |    $simhashVotesSql
              |  FROM h GROUP BY id),
              |fp AS (SELECT id, $simhashFpSql AS simhash FROM v),
              |chunks AS (
              |  SELECT id, simhash, ch.chunk,
              |    (simhash >> (ch.chunk * ${SimhashBits / 4})) & ${(1L << (SimhashBits / 4)) - 1} AS chunk_val
              |  FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) AS ch(chunk)),
              |pairs AS (
              |  SELECT DISTINCT a.id AS ia, b.id AS ib,
              |    a.simhash AS sa, b.simhash AS sb
              |  FROM chunks a JOIN chunks b
              |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.id < b.id),
              |cand AS (SELECT ia, ib FROM pairs WHERE bit_count(xor(sa, sb)) <= 3)
              |SELECT ia AS id_a, ib AS id_b,
              |  CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
              |FROM cand JOIN documents da ON ia = da.doc_id
              |          JOIN documents db ON ib = db.doc_id
              |ORDER BY id_a, id_b""".stripMargin)),

    // SEMANTIC DEDUP CLUSTERS: the composition the corpus pipeline
    // actually runs — embedding-cosine near-dup pairs from the LSH
    // bucket join feed the same min-label/pointer-doubling clustering
    // as the text path (operators compose; nothing is re-implemented).
    // Oracle = LSH replay + cosine filter + recursive-CTE components.
    Q("q_semantic_clusters",
      (s, dir) => {
        val e = emb(s, dir)
        Dedup.nearDupClusters(
            e.select(col("vec_id").as("id")),
            Similarity.lshNearDupPairs(e, minCos = 0.45)
              .select("id_a", "id_b"))
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE $embNormSql,
              |$lshIndexSql,
              |cand AS (
              |  SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
              |  FROM idx a JOIN idx b
              |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |p AS (
              |  SELECT ia, ib FROM cand
              |  JOIN n na ON ia = na.vec_id JOIN n nb ON ib = nb.vec_id
              |  WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= 0.45),
              |edges AS (
              |  SELECT ia AS src, ib AS dst FROM p
              |  UNION ALL SELECT ib, ia FROM p),
              |reach(id, lab) AS (
              |  SELECT vec_id, vec_id FROM embeddings
              |  UNION
              |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.id = e.src)
              |SELECT id, min(lab) AS cluster FROM reach GROUP BY id
              |ORDER BY id""".stripMargin)),

    // Embedding-cosine near-dup — exact all-pairs BASELINE. Small-scale
    // oracle twin of q_embed_neardup_lsh (the non-equi self-join is a
    // nested loop — documented as the thing the LSH path replaces at
    // corpus scale; ext/Dedup.scala:301).
    Q("q_embed_neardup",
      (s, dir) => Dedup.embeddingNearDupPairs(emb(s, dir), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $embNormSql
              |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
              |FROM n a JOIN n b ON a.vec_id < b.vec_id
              |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
              |ORDER BY id_a, id_b""".stripMargin)),

    // SimHash near-dup pairs via pigeonhole banding — the scale path
    // (chunk equi-join, no cross join; ext/Dedup.scala simhashBandedPairs).
    // Fully deterministic → exact-match oracle.
    Q("q_simhash_banded",
      (s, dir) => Dedup.simhashBandedPairs(
          Dedup.simhash(docs(s, dir), "doc_id", "text"), maxDist = 3)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
              |          FROM documents),
              |h AS (SELECT id, ${h60("tok")} AS h FROM t),
              |v AS (SELECT id,
              |    $simhashVotesSql
              |  FROM h GROUP BY id),
              |fp AS (SELECT id, $simhashFpSql AS simhash FROM v),
              |chunks AS (
              |  SELECT id, simhash, ch.chunk,
              |    (simhash >> (ch.chunk * ${SimhashBits / 4})) & ${(1L << (SimhashBits / 4)) - 1} AS chunk_val
              |  FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) AS ch(chunk)),
              |pairs AS (
              |  SELECT DISTINCT a.id AS ia, b.id AS ib,
              |    a.simhash AS sa, b.simhash AS sb
              |  FROM chunks a JOIN chunks b
              |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.id < b.id)
              |SELECT ia AS id_a, ib AS id_b,
              |  CAST(bit_count(xor(sa, sb)) AS INT) AS dist
              |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
              |ORDER BY id_a, id_b""".stripMargin)),

    // Brute-force cosine top-k (the exact ANN baseline; queries = vec_id < 10).
    Q("q_ann_topk",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |q AS (SELECT * FROM n WHERE vec_id < 10),
              |scored AS (
              |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
              |    list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos
              |  FROM q JOIN n ON n.vec_id <> q.vec_id),
              |r AS (SELECT query_id, neighbor_id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
              |  FROM scored)
              |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // LSH-bucketed approximate ANN. The bucketing, multiprobe flips,
    // candidate dedup, and ranking are all deterministic, so the
    // oracle replays the ENTIRE pipeline in SQL (same planes, same
    // 1-bit flips) — a full exact-match check; recall vs brute force
    // is additionally asserted in ScalaTest.
    Q("q_ann_lsh",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.lshTopK(e, e.filter(col("vec_id") < 10), k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |$lshIndexSql,
              |probes AS (
              |  SELECT vec_id AS query_id, tbl, xor(bucket, f) AS bucket
              |  FROM idx CROSS JOIN (VALUES (0), (1), (2), (4), (8), (16), (32)) AS fl(f)
              |  WHERE vec_id < 10),
              |cand AS (
              |  SELECT DISTINCT p.query_id, i.vec_id AS id
              |  FROM idx i JOIN probes p ON i.tbl = p.tbl AND i.bucket = p.bucket
              |  WHERE i.vec_id <> p.query_id),
              |scored AS (
              |  SELECT c.query_id, c.id,
              |    list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm) AS cos
              |  FROM cand c JOIN n cn ON c.id = cn.vec_id
              |              JOIN n qn ON c.query_id = qn.vec_id),
              |r AS (SELECT query_id, id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY cos DESC, id ASC) AS INT) AS rank
              |  FROM scored)
              |SELECT query_id, rank, id AS neighbor_id, round(cos, 6) AS cos
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF approximate ANN — the second scale path next to LSH: corpus
    // assigned row-locally to hash-selected centroid cells, query
    // probes its nProbe nearest cells, exact cosine only inside them.
    // Deterministic end to end → the oracle replays centroid
    // selection, assignment (same dot/cid tie-break), probing, and
    // ranking in SQL.
    Q("q_ann_ivf",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), k = 5,
          nCells = 16, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |$ivfCellsSql,
              |cand AS (
              |  SELECT p.query_id, a.id
              |  FROM asgn a JOIN probes p ON a.cell = p.cell
              |  WHERE a.id <> p.query_id),
              |scored AS (
              |  SELECT c.query_id, c.id,
              |    list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm) AS cos
              |  FROM cand c JOIN n cn ON c.id = cn.vec_id
              |              JOIN n qn ON c.query_id = qn.vec_id),
              |r AS (SELECT query_id, id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY cos DESC, id ASC) AS INT) AS rank
              |  FROM scored)
              |SELECT query_id, rank, id AS neighbor_id, round(cos, 6) AS cos
              |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF with Lloyd-trained centroids (2 sampled spherical-k-means
    // passes over the hash-picked seeds): same query surface as
    // q_ann_ivf, better cell balance → higher recall per probed cell.
    // The refined centroids are a TRAINING artifact (FP summation
    // order in the means), so no SQL oracle — driver records the
    // rows-only check; recall uplift and determinism-of-shape are
    // pinned in SimilaritySpec, numbers in SCALE.md §ANN.
    Q("q_ann_ivf_trained",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), k = 5,
          nCells = 16, nProbe = 2, trainIters = 2)
          .orderBy("query_id", "rank")
      },
      None),

    // Product-quantization ANN — the third classic scale path and the
    // one that changes STORAGE: the corpus scans as m=4 one-byte codes
    // per vector (16× smaller than float32), each pair scores as 4
    // LUT lookups (asymmetric-distance / ADC). Hash-picked codebooks +
    // first-min encode tie-break keep it deterministic, so the oracle
    // replays codebook slicing, encoding, the per-query LUT, and the
    // fixed-order ADC sum bit-exactly in SQL.
    Q("q_ann_pq",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 10), k = 5,
          m = 4, ks = 16)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |$pqCodesSql
              |SELECT query_id, rank, id AS neighbor_id,
              |  round(approx, 6) AS approx_cos
              |FROM pqr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVF-PQ — the composition production ANN deploys (FAISS
    // IndexIVFPQ): IVF cells restrict WHICH codes are scanned
    // (nProbe/nCells of the corpus per query), PQ restricts WHAT a
    // scan reads (m bytes + LUT lookups, not dim floats) — the two
    // dials compose multiplicatively. One oracle replays cells,
    // codebooks, codes, LUT, and the cell-restricted ADC bit-exactly.
    Q("q_ann_ivfpq",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), k = 5,
          nCells = 16, nProbe = 2, m = 4, ks = 16)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |$ivfCellsSql,
              |$pqBaseSql,
              |candc AS (
              |  SELECT p.query_id, a.id
              |  FROM asgn a JOIN probes p ON a.cell = p.cell
              |  WHERE a.id <> p.query_id),
              |contrib AS (
              |  SELECT l.query_id, c.vec_id AS id, l.s, l.dp
              |  FROM codes c JOIN lut l ON l.s = c.s AND l.j = c.code
              |  JOIN candc x ON x.query_id = l.query_id AND x.id = c.vec_id),
              |$pqRankSql
              |SELECT query_id, rank, id AS neighbor_id,
              |  round(approx, 6) AS approx_cos
              |FROM pqr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // PQ retrieve-then-rerank — the production two-stage layout: the
    // byte-code scan nominates top-20 candidates, exact cosine touches
    // only those 20 full-precision vectors per query (vs the whole
    // corpus for brute force). Output is exact-cosine-ranked, so this
    // also serves as the PQ recall harness the oracle can check.
    Q("q_ann_pq_rerank",
      (s, dir) => {
        val e = emb(s, dir)
        Similarity.pqTopK(e, e.filter(col("vec_id") < 10), k = 5,
          m = 4, ks = 16, rerank = 20)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH $embNormSql,
              |$pqCodesSql,
              |cand AS (SELECT query_id, id FROM pqr WHERE rank <= 20),
              |ex AS (
              |  SELECT c.query_id, c.id,
              |    list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm) AS cos
              |  FROM cand c JOIN n cn ON c.id = cn.vec_id
              |              JOIN n qn ON c.query_id = qn.vec_id),
              |rr AS (SELECT query_id, id, cos,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY cos DESC, id ASC) AS INT) AS rank
              |  FROM ex)
              |SELECT query_id, rank, id AS neighbor_id, round(cos, 6) AS cos
              |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Symmetric int8 embedding quantization (4× storage/shuffle
    // reduction) — scalar projections of the (q, scale) struct so the
    // oracle compares without array columns; reconstruction-error
    // bounds live in SimilaritySpec.
    Q("q_quantize",
      (s, dir) => emb(s, dir)
        .select(col("vec_id"), Similarity.quantizedInt8(col("embedding")).as("qs"))
        .select(col("vec_id"),
          round(col("qs.scale"), 6).as("scale"),
          aggregate(col("qs.q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          element_at(col("qs.q"), 1).cast("int").as("q_first"),
          element_at(col("qs.q"), 64).cast("int").as("q_last"))
        .orderBy("vec_id"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |m AS (SELECT vec_id, v,
             |    127.0 / list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
             |q AS (SELECT vec_id, scale,
             |    list_transform(v, x -> round(x * scale)) AS qv FROM m)
             |SELECT vec_id, round(scale, 6) AS scale,
             |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
             |  CAST(qv[1] AS INT) AS q_first, CAST(qv[64] AS INT) AS q_last
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Token statistics: whitespace + BPE-ish counts, mean token length.
    Q("q_token_stats",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
          TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"),
          round(TextAnalysis.meanTokenLen(col("text")), 6).as("mean_tok_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe,
             |  round(CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             |    / greatest(len(string_split(text, ' ')), 1), 6) AS mean_tok_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Fixed-vocab token encoding: corpus top-200 terms → ids 1..200,
    // OOV → 0; gated on per-doc summary stats of the id sequence
    // (count/unk/sum/first/last pin the whole encoding without
    // hashing a raw array column).
    Q("q_encode_tokens",
      (s, dir) => {
        val d = docs(s, dir)
        val vocab = TextAnalysis.buildVocab(d, "text", 200)
        d.select(col("doc_id"),
            TextAnalysis.encodeTokens(col("text"), vocab).as("__ids"))
          .select(col("doc_id"),
            size(col("__ids")).as("n_tok"),
            size(filter(col("__ids"), x => x === 0)).as("n_unk"),
            aggregate(col("__ids"), lit(0L), (a, x) => a + x).as("ids_sum"),
            element_at(col("__ids"), 1).as("id_first"),
            element_at(col("__ids"), size(col("__ids"))).as("id_last"))
          .orderBy("doc_id")
      },
      Some("""WITH vc AS (
             |  SELECT tok, count(*) AS c
             |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY tok),
             |vocab AS (
             |  SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS id
             |  FROM vc ORDER BY c DESC, tok LIMIT 200),
             |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |tt AS (SELECT doc_id, i, ws[i] AS tok
             |       FROM w, unnest(range(1, len(ws) + 1)) AS u(i)),
             |enc AS (SELECT doc_id, i, COALESCE(v.id, 0) AS tid
             |        FROM tt LEFT JOIN vocab v ON tt.tok = v.tok)
             |SELECT doc_id,
             |  CAST(count(*) AS INT) AS n_tok,
             |  CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS INT) AS n_unk,
             |  CAST(sum(tid) AS BIGINT) AS ids_sum,
             |  CAST(first(tid ORDER BY i) AS INT) AS id_first,
             |  CAST(last(tid ORDER BY i) AS INT) AS id_last
             |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Language ID by marker-word scoring (deterministic argmax).
    Q("q_lang_id",
      (s, dir) => TextAnalysis.langId(docs(s, dir), "text")
        .select(col("doc_id") +:
          TextAnalysis.langMarkers.map { case (l, _) => col(s"score_$l") } :+
          col("lang_pred"): _*)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |    $langScoreSql,
              |    $langPredSql AS lang_pred
              |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length/punct/stopword composite.
    Q("q_quality",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
          round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  round(CAST(len(list_filter(ws, t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
             |    / greatest(len(ws), 1), 6) AS stop_ratio,
             |  round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
             |    / greatest(len(text), 1), 6) AS punct_ratio,
             |  round(0.5 * least(CAST(len(text) AS DOUBLE) / 500.0, 1.0)
             |    + 0.25 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(len(text), 1))
             |    + 0.25 * least(CAST(len(list_filter(ws, t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE) / greatest(len(ws), 1) * 5.0, 1.0), 6) AS quality
             |FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // CCNet-style unigram LM quality score, self-scored on the corpus'
    // own token distribution. The oracle gates the EXACT integer
    // surface (token count, summed corpus frequency, rarest-token
    // count — the LM's inputs); the log10 score itself is pinned by
    // TextAnalysisSpec goldens instead: per-term round(log10,6) at a
    // rounding boundary flips digits under a different libm build and
    // the per-doc sum amplifies one term's ulp into many rows
    // (driver-red rounds 3–5).
    Q("q_unigram_lp",
      (s, dir) => TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")
        .select("id", "n_tokens", "sum_c", "min_c")
        .orderBy("id"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
             |  FROM documents),
             |vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term)
             |SELECT id, count(*) AS n_tokens,
             |  CAST(sum(c) AS BIGINT) AS sum_c,
             |  min(c) AS min_c
             |FROM toks JOIN vocab USING (term)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // Bigram-LM scoring (CCNet-style perplexity filter, one rung above
    // q_unigram_lp): per-doc average conditional log-prob of adjacent
    // token pairs under the corpus' own bigram counts. Oracle gates the
    // integer surfaces (bigram count, summed corpus bigram frequency,
    // rarest bigram); the log10 columns are golden-pinned in
    // TextAnalysisSpec, per the same rule as q_unigram_lp.
    Q("q_bigram_lm",
      (s, dir) => TextAnalysis.bigramLogProb(docs(s, dir), "doc_id", "text")
        .select("id", "n_bigrams", "sum_c2", "min_c2")
        .orderBy("id"),
      Some("""WITH bi AS (
             |  SELECT id, ws[i] AS l, ws[i+1] AS r FROM (
             |    SELECT doc_id AS id, unnest(range(1, len(ws))) AS i, ws
             |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
             |          FROM documents))),
             |bg AS (SELECT l, r, count(*) AS c2 FROM bi GROUP BY l, r)
             |SELECT id, count(*) AS n_bigrams,
             |  CAST(sum(c2) AS BIGINT) AS sum_c2, min(c2) AS min_c2
             |FROM bi JOIN bg USING (l, r)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // PMI collocation mining: top-50 adjacent-token pairs by pointwise
    // mutual information (min pair count 5). The ln argument is the
    // identical IEEE op sequence on both engines — same exposure as
    // q_tfidf's ln — so the rank order and round(…,6) replay exactly.
    Q("q_pmi",
      (s, dir) => TextAnalysis.pmiCollocations(docs(s, dir), "text")
        .orderBy("rank"),
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents),
             |uni AS (SELECT term, count(*) AS c_t FROM toks GROUP BY term),
             |bi AS (
             |  SELECT ws[i] AS l, ws[i+1] AS r FROM (
             |    SELECT unnest(range(1, len(ws))) AS i, ws
             |    FROM (SELECT string_split(lower(text), ' ') AS ws
             |          FROM documents))),
             |pc AS (SELECT l, r, count(*) AS c_pair FROM bi GROUP BY l, r),
             |st AS (SELECT
             |    CAST((SELECT sum(c_t) FROM uni) AS DOUBLE) AS n_tok,
             |    CAST((SELECT sum(c_pair) FROM pc) AS DOUBLE) AS n_pairs),
             |sc AS (
             |  SELECT l, r, c_pair, ul.c_t AS c_l, ur.c_t AS c_r,
             |    ln((CAST(c_pair AS DOUBLE) / n_pairs) /
             |       ((CAST(ul.c_t AS DOUBLE) / n_tok) *
             |        (CAST(ur.c_t AS DOUBLE) / n_tok))) AS pmi_raw
             |  FROM pc JOIN uni ul ON pc.l = ul.term
             |          JOIN uni ur ON pc.r = ur.term
             |  CROSS JOIN st
             |  WHERE c_pair >= 5),
             |top AS (SELECT * FROM sc ORDER BY pmi_raw DESC, l, r LIMIT 50)
             |SELECT CAST(row_number() OVER (ORDER BY pmi_raw DESC, l, r) AS INT)
             |    AS rank,
             |  l, r, c_pair, c_l, c_r, round(pmi_raw, 6) AS pmi
             |FROM top ORDER BY rank""".stripMargin)),

    // Model-based quality filter: multinomial Naive Bayes trained on
    // the corpus against the heuristic teacher label, scoring every
    // document (graft.ext.QualityModel). Oracle gates the integer
    // surfaces (teacher label, token count, class-evidence sums); the
    // llr score columns are golden-pinned in QualityModelSpec.
    Q("q_quality_nb",
      (s, dir) => graft.ext.QualityModel
        .nbQualityScores(docs(s, dir), "doc_id", "text")
        .select("id", "y", "n_tokens", "sum_c1", "sum_c0")
        .orderBy("id"),
      Some("""WITH lab AS (
             |  SELECT doc_id AS id,
             |    CASE WHEN len(text) >= 200 AND
             |      len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) >= 5
             |    THEN 1 ELSE 0 END AS y, text
             |  FROM documents),
             |toks AS (
             |  SELECT id, y, unnest(string_split(text, ' ')) AS term FROM lab),
             |ts AS (SELECT term, sum(y) AS c1, sum(1 - y) AS c0
             |       FROM toks GROUP BY term)
             |SELECT id, y, count(*) AS n_tokens,
             |  CAST(sum(c1) AS BIGINT) AS sum_c1,
             |  CAST(sum(c0) AS BIGINT) AS sum_c0
             |FROM toks JOIN ts USING (term)
             |GROUP BY id, y ORDER BY id""".stripMargin)),

    // TF-IDF top-3 terms per document (smoothed idf, total tie-break).
    // ln() replays across engines; scores round to 6 decimals on both
    // sides. The one driver literal is the corpus doc count (documented
    // two-job constant-fold, TextAnalysis.tfIdfTopTerms).
    Q("q_tfidf",
      (s, dir) => TextAnalysis.tfIdfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
        .withColumn("score", round(col("score"), 6))
        .orderBy("id", "rank"),
      Some("""WITH tf AS (
             |  SELECT id, term, count(*) AS tf FROM (
             |    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term
             |    FROM documents)
             |  GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT id, term, tf, df,
             |    tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS score
             |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
             |r AS (SELECT id, term, tf, df, score,
             |    CAST(row_number() OVER (PARTITION BY id
             |      ORDER BY score DESC, term ASC) AS INT) AS rank
             |  FROM scored)
             |SELECT id, rank, term, tf, df, round(score, 6) AS score
             |FROM r WHERE rank <= 3 ORDER BY id, rank""".stripMargin)),

    // BM25 top-k retrieval for a fixed query-term set: per-term tf as
    // row-local filter counts, one broadcast stats agg, distributed
    // TakeOrdered top-k. The score expression is the identical IEEE
    // op sequence on both engines (constants combined engine-side);
    // ln drift absorbed by round(…, 6), same exposure as q_tfidf.
    Q("q_bm25", {
      (s, dir) => TextAnalysis.bm25Rank(docs(s, dir), "doc_id", "text",
          terms = Seq("spark", "query", "window"), topK = 50)
        .orderBy("rank")
    },
      Some {
        val terms = Seq("spark", "query", "window")
        val tfCols = terms.zipWithIndex.map { case (t, i) =>
          s"len(list_filter(string_split(text, ' '), x -> x = '$t')) AS tf_$i"
        }.mkString(",\n             |    ")
        val dfCols = terms.indices.map(i =>
          s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
          .mkString(", ")
        val scoreTerms = terms.indices.map(i =>
          s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0)
             |      * (tf_$i * (1.2 + 1.0))
             |      / (tf_$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"""
            .stripMargin).mkString("\n             |    + ")
        s"""WITH t AS (SELECT doc_id AS id, CAST(len(string_split(text, ' ')) AS INT) AS dl,
           |    $tfCols
           |  FROM documents),
           |s AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfCols FROM t),
           |sc AS (SELECT id, dl,
           |    $scoreTerms AS score_raw
           |  FROM t CROSS JOIN s)
           |SELECT id, CAST(row_number() OVER (ORDER BY score_raw DESC, id) AS INT) AS rank,
           |  dl, round(score_raw, 6) AS score
           |FROM sc ORDER BY score_raw DESC, id LIMIT 50""".stripMargin
      }),

    // Frequency sketch (DataSketches frequent-items via Spark 4's
    // approx_top_k): THE approximate heavy-hitters answer at 100 TB —
    // one pass, mergeable, fixed memory, where exact global top-k
    // needs a full groupBy. Sized exactly here (maxItemsTracked ≫
    // distinct props), the sketch's counts are provably exact, so the
    // oracle is a plain exact histogram — the same exact-regime
    // pinning used for the HLL family.
    Q("q_heavy_hitters",
      (s, dir) => Tables(s, dir, "events")
        .agg(expr("approx_top_k(props, 200, 1000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("cnt"))
        .orderBy("item"),
      Some("""SELECT props AS item, count(*) AS cnt
             |FROM events GROUP BY props ORDER BY item""".stripMargin)),

    // Rolling polynomial document fingerprint (order-sensitive).
    Q("q_fingerprint",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  list_reduce(
              |    list_prepend(CAST(0 AS BIGINT),
              |      list_transform(string_split(text, ' '),
              |        t -> ${h60("t")} % $TokenMod)),
              |    (a, b) -> (a * 31 + b) % $FpMod) AS fp
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // PII scrubbing: the derived column plants an email, a phone and
    // an IP per row (deterministic from doc_id, so both engines build
    // the identical input over the real table) and the redaction chain
    // must replace all three; the doc text tail proves non-PII text
    // passes through untouched. Row-local regexp projection.
    Q("q_redact_pii",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.redactPii(concat_ws(" ",
            concat(lit("contact doc"), col("doc_id").cast("string"),
              lit("@example.com")),
            lit("call 555-123-4567"),
            concat(lit("ip 10.0.0."), pmod(col("doc_id"), lit(256)).cast("string")),
            substring(col("text"), 1, 40))).as("redacted"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(
             |    'contact doc' || doc_id || '@example.com' ||
             |      ' call 555-123-4567 ip 10.0.0.' || (doc_id % 256) ||
             |      ' ' || substr(text, 1, 40),
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS redacted
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Within-doc repetition (Gopher/C4 repetition filter): fraction of
    // duplicated word 3-grams, with the filter verdict computed from
    // the ROUNDED ratio so the boolean can't flip on a ulp.
    Q("q_repetition",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          round(TextAnalysis.repeatedNgramRatio(col("text"), 3), 6)
            .as("rep_ratio"))
        .withColumn("is_repetitive", (col("rep_ratio") > 0.5).cast("boolean"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |g AS (SELECT doc_id,
             |    list_transform(range(0, greatest(len(ws) - 2, 1)),
             |      i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS grams,
             |    len(ws) - 2 AS total
             |  FROM t)
             |SELECT doc_id,
             |  round(CASE WHEN total <= 0 THEN 0.0
             |    ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / total
             |    END, 6) AS rep_ratio,
             |  round(CASE WHEN total <= 0 THEN 0.0
             |    ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / total
             |    END, 6) > 0.5 AS is_repetitive
             |FROM g ORDER BY doc_id""".stripMargin)),

    // Stable md5-derived train/valid/test split (layout-independent,
    // re-run-stable — the property a training split must have).
    Q("q_hash_split",
      (s, dir) => TrainingData.withSplit(docs(s, dir), col("doc_id"))
        .select("doc_id", "split_bucket", "split")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(${h60("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS split_bucket,
              |  CASE WHEN ${h60("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
              |       WHEN ${h60("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'valid'
              |       ELSE 'test' END AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Token-budget truncation (first 16 whitespace tokens).
    Q("q_truncate",
      (s, dir) => docs(s, dir).select(
          col("doc_id"),
          TrainingData.truncateTokens(col("text"), 16).as("trunc"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  array_to_string(list_slice(string_split(text, ' '), 1, 16), ' ') AS trunc
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Context-window packing — PRIMARY (scale) path: sharded by
    // `source`, so each shard's cumulative-token window sorts
    // independently in its own task instead of one global single-task
    // sort (the q_pack_global plan). Bins are per-shard; at 100 TB the
    // shard column is whatever parallelism unit the packer wants
    // (source, date, hash bucket).
    Q("q_pack",
      (s, dir) => TrainingData.packIntoBins(
          docs(s, dir), "text", "doc_id", budget = 2000, shard = Some("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("tokens_before").cast("long").as("tokens_before"), col("bin"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |  CAST(SUM(len(string_split(text, ' ')))
             |    OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |    - len(string_split(text, ' ')) AS BIGINT) AS tokens_before,
             |  CAST(FLOOR((SUM(len(string_split(text, ' ')))
             |    OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |    - len(string_split(text, ' '))) / 2000.0) AS INT) AS bin
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Unsharded packing BASELINE: one global token stream — the exact
    // reference semantic for a corpus small enough to sort in one task
    // (single-task window documented in TrainingData.packIntoBins; the
    // registered scale path is the sharded q_pack above — same
    // demotion pattern as q_embed_neardup vs q_embed_neardup_lsh).
    Q("q_pack_global",
      (s, dir) => TrainingData.packIntoBins(
          docs(s, dir), "text", "doc_id", budget = 2000)
        .select(col("doc_id"), col("n_tokens"),
          col("tokens_before").cast("long").as("tokens_before"), col("bin"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |  CAST(SUM(len(string_split(text, ' ')))
             |    OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |    - len(string_split(text, ' ')) AS BIGINT) AS tokens_before,
             |  CAST(FLOOR((SUM(len(string_split(text, ' ')))
             |    OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |    - len(string_split(text, ' '))) / 2000.0) AS INT) AS bin
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Overlapping token-window chunking (size 64, overlap 16 → stride
    // 48): the pretraining/RAG chunker as a row-local generator
    // projection; short docs yield exactly one chunk.
    Q("q_chunk",
      (s, dir) => TrainingData.chunkTokens(docs(s, dir), "doc_id", "text",
          chunkSize = 64, overlap = 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |c AS (SELECT doc_id, ws,
             |    CAST(unnest(range(0, CASE WHEN len(ws) <= 64 THEN 1
             |      ELSE CAST(ceil((len(ws) - 16) / 48.0) AS INT) END)) AS INT) AS chunk_idx
             |  FROM t)
             |SELECT doc_id, chunk_idx,
             |  array_to_string(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ') AS chunk_text,
             |  CAST(len(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS INT) AS chunk_tokens
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Corpus accounting per source: the dataset-card numbers every
    // training corpus reports — doc count, token volume, summed
    // quality — one map-side-combinable aggregation over codegen'd
    // projections. Quality (already 6-decimal) sums through
    // DECIMAL(18,6) so the float total is order-independent (same rule
    // as every dsum in the registry).
    Q("q_corpus_stats",
      (s, dir) => docs(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCountWs(col("text")).cast("long")).as("total_tokens"),
          max(TextAnalysis.tokenCountWs(col("text"))).as("max_tokens"),
          // returned AS the decimal — a final decimal→double cast is
          // not correctly-rounded identically across engines (1-ulp
          // driver/local divergence, round-3 hash-red), and the
          // decimal sum is already exact
          sum(TextAnalysis.qualityScore(col("text")).cast("decimal(18,6)"))
            .as("sum_quality"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  CAST(MAX(len(string_split(text, ' '))) AS INT) AS max_tokens,
             |  CAST(SUM(CAST(round(0.5 * least(CAST(len(text) AS DOUBLE) / 500.0, 1.0)
             |    + 0.25 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE) / greatest(len(text), 1))
             |    + 0.25 * least(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
             |        / greatest(len(string_split(text, ' ')), 1) * 5.0, 1.0), 6) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS sum_quality
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Corpus snapshot diff — incremental-ingest bookkeeping: classify
    // every key added/removed/changed/unchanged between two snapshots
    // by comparing 16-byte content digests (the join never ships the
    // text; added∪changed is exactly the slice the admission ladder
    // has to process on a re-crawl). Snapshots synthesized from the
    // documents table: prev drops doc_id%10=0, cur drops doc_id%10=3
    // and rewrites every doc_id%7=0 text.
    Q("q_snapshot_diff",
      (s, dir) => {
        val d = docs(s, dir)
        val prev = d.filter(col("doc_id") % 10 =!= 0)
        val cur = d.filter(col("doc_id") % 10 =!= 3)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        graft.ext.Snapshot.diff(prev, cur, "doc_id",
          Seq("text", "lang", "source"))
          .orderBy("doc_id")
      },
      Some("""WITH prev AS (
             |  SELECT doc_id, md5(concat_ws(chr(1),
             |    coalesce(text, chr(0)), coalesce(lang, chr(0)),
             |    coalesce(source, chr(0)))) AS dig
             |  FROM documents WHERE doc_id % 10 <> 0),
             |cur AS (
             |  SELECT doc_id, md5(concat_ws(chr(1),
             |    coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END, chr(0)),
             |    coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS dig
             |  FROM documents WHERE doc_id % 10 <> 3)
             |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
             |  CASE WHEN p.dig IS NULL THEN 'added'
             |       WHEN c.dig IS NULL THEN 'removed'
             |       WHEN p.dig = c.dig THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Distribution drift (PSI) over document length between two corpus
    // slices — the between-snapshots monitor: per-bucket Population
    // Stability Index terms, fixed-width buckets so the bucketing
    // never retrains. Two scans reduced map-side to ≤16 rows each;
    // totals ride 1-row broadcasts (ship-the-stats).
    Q("q_drift",
      (s, dir) => {
        val d = docs(s, dir)
        graft.ext.Drift.psiNumeric(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1),
          "n_chars", width = 64, nBuckets = 16)
          .orderBy("bucket")
      },
      Some("""WITH ref AS (
             |  SELECT least(15, CAST(n_chars // 64 AS INT)) AS bucket,
             |    count(*) AS cnt_ref
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |cur AS (
             |  SELECT least(15, CAST(n_chars // 64 AS INT)) AS bucket,
             |    count(*) AS cnt_cur
             |  FROM documents WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL
             |  GROUP BY 1),
             |tr AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS t_ref FROM ref),
             |tc AS (SELECT CAST(sum(cnt_cur) AS BIGINT) AS t_cur FROM cur),
             |j AS (
             |  SELECT coalesce(r.bucket, c.bucket) AS bucket,
             |    coalesce(r.cnt_ref, 0) AS cnt_ref,
             |    coalesce(c.cnt_cur, 0) AS cnt_cur
             |  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket)
             |SELECT CAST(bucket AS INT) AS bucket, cnt_ref, cnt_cur,
             |  round(CAST(cnt_ref AS DOUBLE) / t_ref, 6) AS p_ref,
             |  round(CAST(cnt_cur AS DOUBLE) / t_cur, 6) AS p_cur,
             |  round((CAST(cnt_ref AS DOUBLE) / t_ref - CAST(cnt_cur AS DOUBLE) / t_cur)
             |    * ln(greatest(CAST(cnt_ref AS DOUBLE) / t_ref, 1e-6)
             |        / greatest(CAST(cnt_cur AS DOUBLE) / t_cur, 1e-6)), 6) AS psi_term
             |FROM j CROSS JOIN tr CROSS JOIN tc
             |ORDER BY bucket""".stripMargin)),

    // Categorical drift twin: PSI terms over the language mix — the
    // report a multilingual corpus runs before a new source shifts the
    // training distribution.
    Q("q_drift_lang",
      (s, dir) => {
        val d = docs(s, dir)
        graft.ext.Drift.psiCategorical(
          d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1), "lang")
          .orderBy("category")
      },
      Some("""WITH ref AS (
             |  SELECT lang AS category, count(*) AS cnt_ref
             |  FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
             |  GROUP BY 1),
             |cur AS (
             |  SELECT lang AS category, count(*) AS cnt_cur
             |  FROM documents WHERE doc_id % 2 = 1 AND lang IS NOT NULL
             |  GROUP BY 1),
             |tr AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS t_ref FROM ref),
             |tc AS (SELECT CAST(sum(cnt_cur) AS BIGINT) AS t_cur FROM cur),
             |j AS (
             |  SELECT coalesce(r.category, c.category) AS category,
             |    coalesce(r.cnt_ref, 0) AS cnt_ref,
             |    coalesce(c.cnt_cur, 0) AS cnt_cur
             |  FROM ref r FULL OUTER JOIN cur c ON r.category = c.category)
             |SELECT category, cnt_ref, cnt_cur,
             |  round(CAST(cnt_ref AS DOUBLE) / t_ref, 6) AS p_ref,
             |  round(CAST(cnt_cur AS DOUBLE) / t_cur, 6) AS p_cur,
             |  round((CAST(cnt_ref AS DOUBLE) / t_ref - CAST(cnt_cur AS DOUBLE) / t_cur)
             |    * ln(greatest(CAST(cnt_ref AS DOUBLE) / t_ref, 1e-6)
             |        / greatest(CAST(cnt_cur AS DOUBLE) / t_cur, 1e-6)), 6) AS psi_term
             |FROM j CROSS JOIN tr CROSS JOIN tc
             |ORDER BY category""".stripMargin)),

    // END-TO-END corpus preparation: lang gate → quality gate → exact
    // dedup → MinHash near-dup dedup → stable split, as ONE call
    // (ext.CorpusPipeline) — and ONE oracle replaying all five stages
    // (the near-dup stage re-runs the full LSH + recursive-CTE cluster
    // replay, scoped to the gated survivor set).
    Q("q_corpus_prepare",
      (s, dir) => CorpusPipeline.prepare(docs(s, dir), "doc_id", "text",
          allowedLangs = Seq("en", "de", "fr"), minQuality = 0.5)
        .orderBy("doc_id"),
      Some {
        val split = s"${h60("CAST(doc_id AS VARCHAR)")} % 100"
        s"""WITH RECURSIVE
           |scored AS (
           |  SELECT doc_id, text, string_split(text, ' ') AS ws,
           |    round(0.5 * least(CAST(len(text) AS DOUBLE) / 500.0, 1.0)
           |      + 0.25 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / greatest(len(text), 1))
           |      + 0.25 * least(CAST(len(list_filter(ws, t -> t IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
           |          / greatest(len(ws), 1) * 5.0, 1.0), 6) AS quality,
           |    $langScoreSql
           |  FROM documents),
           |lid AS (SELECT *, $langPredSql AS lang_pred FROM scored),
           |kept AS (
           |  SELECT doc_id, text, ws, quality, lang_pred FROM lid
           |  WHERE lang_pred IN ('en', 'de', 'fr') AND quality >= 0.5),
           |exact AS (
           |  SELECT k.* FROM kept k
           |  JOIN (SELECT md5(text) AS dg, min(doc_id) AS rep
           |        FROM kept GROUP BY 1) w
           |    ON md5(k.text) = w.dg AND k.doc_id = w.rep),
           |${shinglesSqlFrom("exact")},
           |$minhashSql,
           |$bandsSql,
           |cand AS (
           |  SELECT DISTINCT a.id AS ca, b.id AS cb
           |  FROM bands a JOIN bands b
           |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
           |shp AS (SELECT sh.* FROM sh
           |        WHERE id IN (SELECT ca FROM cand) OR id IN (SELECT cb FROM cand)),
           |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
           |shared AS (
           |  SELECT ca AS ia, cb AS ib, count(*) AS shared
           |  FROM cand JOIN shp a ON ca = a.id
           |            JOIN shp b ON cb = b.id AND a.h = b.h
           |  GROUP BY 1, 2),
           |p AS (
           |  SELECT ia AS id_a, ib AS id_b
           |  FROM shared JOIN sz sa ON ia = sa.id JOIN sz sb ON ib = sb.id
           |  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM p
           |  UNION ALL SELECT id_b, id_a FROM p),
           |reach(id, lab) AS (
           |  SELECT doc_id, doc_id FROM exact
           |  UNION
           |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON r.id = e.src),
           |clu AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
           |SELECT doc_id, lang_pred, quality, CAST(len(ws) AS INT) AS n_tokens,
           |  CAST($split AS INT) AS split_bucket,
           |  CASE WHEN $split < 80 THEN 'train'
           |       WHEN $split < 90 THEN 'valid'
           |       ELSE 'test' END AS split
           |FROM exact JOIN clu ON doc_id = clu.id AND clu.cluster = doc_id
           |ORDER BY doc_id""".stripMargin
      }),

    // Layout-independent 20% hash sample (same stability story).
    Q("q_hash_sample",
      (s, dir) => TrainingData.hashSample(docs(s, dir), col("doc_id"), 200)
        .orderBy("doc_id"),
      Some(s"""SELECT * FROM documents
              |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < 200
              |ORDER BY doc_id""".stripMargin)),

    // Stratified (per-source) hash sample — class rebalancing with the
    // same layout-independent stability; pure filter, no count pass.
    Q("q_stratified_sample",
      (s, dir) => TrainingData.stratifiedHashSample(docs(s, dir),
          col("doc_id"), "source", Map("src0" -> 100, "src1" -> 500))
        .orderBy("doc_id"),
      Some(s"""SELECT * FROM documents
              |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 <
              |  CASE WHEN source = 'src0' THEN 100
              |       WHEN source = 'src1' THEN 500 ELSE 1000 END
              |ORDER BY doc_id""".stripMargin)),

    // Deterministic fixed-N per-stratum sample: exactly 50 docs per
    // source by md5-hash order — the exact-size counterpart of the
    // rate-based stratified sample above.
    Q("q_fixed_sample",
      (s, dir) => TrainingData.fixedNPerStratum(
          docs(s, dir), col("doc_id"), "source", n = 50)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, text, lang, source, n_chars FROM (
             |  SELECT *, row_number() OVER (PARTITION BY source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 50
             |ORDER BY doc_id""".stripMargin)),

    // Temperature-flattened language mix (α = 0.5): per-lang keep rate
    // floor(sqrt((1e6·n_min) div n_s)) permille — integer div + sqrt of
    // an exact integer is correctly rounded everywhere, so the rate is
    // bit-identical cross-engine (no pow(double) drift).
    Q("q_temperature_mix",
      (s, dir) => TrainingData.temperatureMix(
          docs(s, dir), col("doc_id"), "lang")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
              |r AS (SELECT lang, CAST(floor(sqrt(CAST(
              |    (1000000 * (SELECT min(n) FROM c)) // n AS DOUBLE))) AS INT) AS rate
              |  FROM c)
              |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
              |FROM documents d JOIN r USING (lang)
              |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 < rate
              |ORDER BY doc_id""".stripMargin)),

    // PPS sampling: keep each doc with probability ∝ its (capped)
    // length — weight = least(n_chars, 1000)/1000, the same md5
    // bucket membership as every sampler (pure filter, zero shuffle).
    Q("q_weighted_sample",
      (s, dir) => TrainingData.weightedHashSample(docs(s, dir),
          col("doc_id"),
          least(col("n_chars"), lit(1000)).cast("double") / lit(1000.0))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source, n_chars FROM documents
              |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000
              |  < CAST(floor((CAST(least(n_chars, 1000) AS DOUBLE) / 1000.0) * 1000.0) AS INT)
              |ORDER BY doc_id""".stripMargin)),

    // Per-source token-budget cap: keep docs in md5-hash order while
    // the running token count before the doc is under 800 — the "no
    // more than N tokens from any one domain" rule; straddler kept.
    Q("q_token_cap",
      (s, dir) => TrainingData.capTokensPerStratum(
          docs(s, dir), col("doc_id"), "source", "text", budget = 800L)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, text, lang, source, n_chars FROM (
             |  SELECT *, sum(len(string_split(text, ' '))) OVER (
             |      PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    - len(string_split(text, ' ')) AS tok_before
             |  FROM documents)
             |WHERE tok_before < 800
             |ORDER BY doc_id""".stripMargin)),

    // Per-document n-gram novelty: fraction of a doc's distinct
    // 3-shingles appearing in no other document (df=1) — the inverse
    // of boilerplate share (Dedup.noveltyScores).
    Q("q_novelty",
      (s, dir) => Dedup.noveltyScores(docs(s, dir), "doc_id", "text")
        .orderBy("id"),
      Some(s"""WITH $shinglesSql,
              |dfc AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
              |SELECT id, count(*) AS n_shingles,
              |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_unique,
              |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              |    / count(*), 6) AS novelty
              |FROM sh JOIN dfc USING (h)
              |GROUP BY id ORDER BY id""".stripMargin)),

    // Winnowed span-hash index (MOSS fingerprinting): per-window
    // minimum over the stride-1 8-word span hashes at window=4 —
    // the content-defined ~2.5× compression of the substring index
    // (Dedup.winnowedSpanHashIndex). Surface: per-doc span count,
    // selected-fingerprint count, min fingerprint — all exact ints.
    Q("q_winnow",
      (s, dir) => {
        val d = docs(s, dir)
        // n_spans = max(words - 7, 0) row-locally — re-running the
        // md5 span walk just to count it doubled the dominant hashing
        // cost the winnow expression exists to avoid (r10 ADVICE)
        val nsp = d.select(col("doc_id").as("id"),
          greatest(size(split(col("text"), " ")) - 7, lit(0)).as("n_spans"))
        Dedup.winnowedSpanHashIndex(d, "doc_id", "text", spanWords = 8,
            window = 4)
          .groupBy("id")
          .agg(count(lit(1)).as("n_selected"), min(col("h")).as("min_h"))
          .join(nsp, Seq("id"))
          .select("id", "n_spans", "n_selected", "min_h")
          .orderBy("id")
      },
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
              |          FROM documents),
              |sp AS (SELECT doc_id,
              |    list_transform(range(0, greatest(len(ws) - 7, 0)),
              |      i -> ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")})
              |      AS spans
              |  FROM w),
              |sel AS (SELECT doc_id, len(spans) AS n_spans,
              |    CASE WHEN len(spans) >= 4 THEN
              |      list_distinct(list_transform(range(1, len(spans) - 2),
              |        i -> list_min(spans[i:(i+3)])))
              |    WHEN len(spans) >= 1 THEN [list_min(spans)]
              |    ELSE [] END AS fps
              |  FROM sp)
              |SELECT doc_id AS id, CAST(n_spans AS INT) AS n_spans,
              |  CAST(len(fps) AS BIGINT) AS n_selected,
              |  list_min(fps) AS min_h
              |FROM sel WHERE len(fps) > 0 ORDER BY id""".stripMargin)),

    // Corpus-level repeated-span removal (C4/Gopher "remove duplicated
    // text" for line-less corpora): 5-word segments, any span occurring
    // > 2× corpus-wide deleted everywhere, docs reassembled in order.
    Q("q_span_dedup",
      (s, dir) => Dedup.dropRepeatedSpans(docs(s, dir), "doc_id", "text",
          spanWords = 5, maxOccurrences = 2)
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sp AS (SELECT doc_id, i AS pos,
             |         array_to_string(ws[(i*5+1):((i+1)*5)], ' ') AS span
             |       FROM w, unnest(range(0, CAST(ceil(len(ws)/5.0) AS INT))) AS t(i)),
             |d AS (SELECT span, true AS dup FROM sp GROUP BY span HAVING count(*) > 2)
             |SELECT sp.doc_id,
             |  coalesce(string_agg(CASE WHEN d.dup IS NULL THEN sp.span END,
             |    ' ' ORDER BY sp.pos), '') AS text_clean,
             |  CAST(count(*) AS INT) AS n_spans,
             |  CAST(sum(CASE WHEN d.dup IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_removed
             |FROM sp LEFT JOIN d ON sp.span = d.span
             |GROUP BY sp.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Cross-document exact-substring pairs: docs sharing ≥2 distinct
    // verbatim 8-word windows (stride-1 rolling hashes — catches a
    // lifted paragraph inside an otherwise-unrelated doc, the case
    // Jaccard dilutes and MinHash misses). Same inverted-index tail
    // as the shingle family (df-1 pruning + hot-key triangle join).
    Q("q_substring_pairs",
      (s, dir) => Dedup.crossDocSpanPairs(docs(s, dir), "doc_id", "text",
          spanWords = 8, minShared = 2L)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              |sp AS (SELECT DISTINCT doc_id AS id,
              |    ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")} AS h
              |  FROM w, unnest(range(0, greatest(len(ws) - 7, 0))) AS t(i))
              |SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared_spans
              |FROM sp a JOIN sp b ON a.h = b.h AND a.id < b.id
              |GROUP BY 1, 2 HAVING count(*) >= 2
              |ORDER BY id_a, id_b""".stripMargin)),

    // Cross-document exact-substring REMOVAL: every word covered by an
    // 8-word window whose hash occurs in ≥2 distinct docs is deleted —
    // the "remove any ≥N-token span that appears verbatim elsewhere"
    // pass (suffix-array decision boundary, inverted-index plumbing;
    // no pair generation at all, so no hot-key risk).
    Q("q_substring_dedup",
      (s, dir) => Dedup.dropCrossDocSpans(docs(s, dir), "doc_id", "text",
          spanWords = 8, minDocs = 2)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              |sp AS (SELECT doc_id,
              |    unnest(range(0, greatest(len(ws) - 7, 0))) AS pos,
              |    unnest(list_transform(range(0, greatest(len(ws) - 7, 0)),
              |      i -> ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")})) AS h
              |  FROM w),
              |ch AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp)
              |       GROUP BY h HAVING count(*) >= 2),
              |bad AS (SELECT doc_id, list(pos) AS ps FROM sp
              |        WHERE h IN (SELECT h FROM ch) GROUP BY doc_id)
              |SELECT w.doc_id,
              |  coalesce(array_to_string(list_filter(list_transform(range(1, len(ws) + 1),
              |    j -> CASE WHEN len(list_filter(coalesce(b.ps, []),
              |                  p -> p <= j - 1 AND j - 1 < p + 8)) > 0
              |         THEN NULL ELSE ws[j] END), x -> x IS NOT NULL), ' '), '') AS text_clean,
              |  CAST(len(ws) AS INT) AS n_words,
              |  CAST(len(list_filter(range(0, len(ws)),
              |    j -> len(list_filter(coalesce(b.ps, []),
              |           p -> p <= j AND j < p + 8)) > 0)) AS INT) AS n_dropped
              |FROM w LEFT JOIN bad b USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // Longest shared verbatim run per pair — full suffix-array
    // semantics off the same stride-1 index: matches with a constant
    // alignment offset and consecutive positions are one island, and
    // an island of r windows witnesses a run of r+7 tokens. τ = 10
    // words.
    Q("q_substring_runs",
      (s, dir) => Dedup.crossDocSpanRuns(docs(s, dir), "doc_id", "text",
          spanWords = 8, minRunWords = 10)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              |sp AS (SELECT doc_id,
              |    unnest(range(0, greatest(len(ws) - 7, 0))) AS pos,
              |    unnest(list_transform(range(0, greatest(len(ws) - 7, 0)),
              |      i -> ${h60("array_to_string(ws[(i+1):(i+8)], ' ')")})) AS h
              |  FROM w),
              |co AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
              |         a.pos AS pa, b.pos AS pb
              |       FROM sp a JOIN sp b ON a.h = b.h AND a.doc_id < b.doc_id),
              |isl AS (SELECT ia, ib, pb - pa AS diff, pa,
              |          pa - row_number() OVER (
              |            PARTITION BY ia, ib, pb - pa ORDER BY pa) AS island
              |        FROM co),
              |runs AS (SELECT ia, ib, count(*) AS len
              |         FROM isl GROUP BY ia, ib, diff, island)
              |SELECT ia AS id_a, ib AS id_b, max(len) + 7 AS max_run_words
              |FROM runs GROUP BY 1, 2 HAVING max(len) + 7 >= 10
              |ORDER BY id_a, id_b""".stripMargin)),

    // Per-source corpus diversity: doc count, EXACT decimal TTR sum,
    // and the closed-world per-language counts (fixed 5-lang set).
    // The counts ARE the entropy's inputs and are exact on both
    // engines; lang_entropy itself (p·ln p rounded at 6 dp — the
    // libm-ulp hazard, driver-red rounds 3–5) is pinned by a
    // TextAnalysisSpec golden, not the cross-engine hash.
    Q("q_diversity",
      (s, dir) => TextAnalysis.corpusDiversity(docs(s, dir),
          "source", "lang", "text", Seq("de", "en", "es", "fr", "zh"))
        // lang_entropy (libm p·ln p) and sum_ttr (sum of per-doc
        // round(double,6)) are the two cross-engine 1-ulp hazards;
        // the hashed surface carries only their EXACT integer inputs
        // (sum_nd/sum_nt, c_<lang>) — the floats are golden-pinned in
        // TextAnalysisSpec per the SURVEY §5 rule.
        .drop("lang_entropy", "sum_ttr")
        .orderBy("source"),
      Some {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val cCols = langs.map(l =>
          s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS c_$l")
          .mkString(", ")
        s"""WITH t AS (SELECT source, lang,
           |    len(list_distinct(string_split(text, ' '))) AS nd,
           |    len(string_split(text, ' ')) AS nt
           |  FROM documents)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(nd) AS BIGINT) AS sum_nd,
           |  CAST(sum(nt) AS BIGINT) AS sum_nt, $cCols
           |FROM t GROUP BY 1 ORDER BY source""".stripMargin
      }),

    // BPE merge statistic: top-50 adjacent-token pairs by frequency —
    // the per-round counting pass of a tokenizer trainer. Pairs are
    // row-local (zip_with over shifted slices); one map-side-combined
    // shuffle + distributed TakeOrdered.
    // BPE tokenizer TRAINING (the full loop q_bpe_pairs is one round
    // of): corpus scanned once into the word-freq vocab, then 20
    // merge rounds over the compressed vocab — deterministic tie-break
    // (freq desc, pair asc), so the merge table is layout-stable.
    // No SQL oracle (iterative, data-dependent rules per round —
    // not expressible as one static query); rows-only check here,
    // the textbook training trace is pinned in TextAnalysisSpec.
    Q("q_bpe_train",
      (s, dir) => TextAnalysis.bpeTrain(docs(s, dir), "text", merges = 20)
        .orderBy("round"),
      None),

    // Train-then-encode round trip: the 20 learned merges applied back
    // to the corpus (lowest-rank-first encode loop, compiled rank map
    // shipped once per plan). Rows-only like training — the rules are
    // data-dependent — with the encode semantics pinned against the
    // textbook trace in TextAnalysisSpec.
    Q("q_bpe_encode",
      (s, dir) => {
        val d = docs(s, dir)
        val rules = TextAnalysis.bpeTrain(d, "text", merges = 20)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextAnalysis.bpeEncode(d, "text", rules)
          .select(col("doc_id"), size(col("subwords")).as("n_sub"),
            element_at(col("subwords"), 1).as("first_sub"),
            element_at(col("subwords"), -1).as("last_sub"))
          .orderBy("doc_id")
      },
      None),

    Q("q_bpe_pairs",
      (s, dir) => TextAnalysis.bpePairs(docs(s, dir), "text", topK = 50),
      Some("""WITH ws AS (SELECT string_split(lower(text), ' ') AS w
             |  FROM documents),
             |p AS (SELECT unnest(list_transform(range(1, len(w)),
             |    i -> w[i] || ' ' || w[i+1])) AS pair FROM ws)
             |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
             |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin)),

    // Zipf head: top-100 tokens with rank and cumulative corpus share —
    // the rank-frequency profile for corpus health checks. Vocab agg +
    // TakeOrdered; the k-row head (not the vocabulary) takes the rank
    // window, and the token total rides a one-row broadcast.
    Q("q_zipf",
      (s, dir) => TextAnalysis.zipfHead(docs(s, dir), "text", topK = 100),
      Some("""WITH v AS (SELECT t AS term, count(*) AS freq
             |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
             |        FROM documents) GROUP BY 1),
             |tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS n_total FROM v),
             |h AS (SELECT term, freq FROM v
             |      ORDER BY freq DESC, term LIMIT 100)
             |SELECT CAST(row_number() OVER w AS INT) AS rank, term, freq,
             |  round(CAST(SUM(freq) OVER w AS DOUBLE) / n_total, 6) AS cum_share
             |FROM h, tot
             |WINDOW w AS (ORDER BY freq DESC, term)
             |ORDER BY rank""".stripMargin)),

    // Weighted repetition (epoch upsampling): src0 ×3, src2 dropped,
    // everything else ×1 — the training-mix knob as a generator
    // projection (weight 0 = empty sequence = stratum removed).
    Q("q_repeat_weighted",
      (s, dir) => TrainingData.repeatByWeight(
          docs(s, dir).select("doc_id", "source"), "source",
          Map("src0" -> 3, "src2" -> 0))
        .orderBy("doc_id", "copy"),
      Some("""SELECT doc_id, source,
             |  CAST(unnest(range(CASE WHEN source = 'src0' THEN 3
             |    WHEN source = 'src2' THEN 0 ELSE 1 END)) AS INT) AS copy
             |FROM documents ORDER BY doc_id, copy""".stripMargin)),

    // Deterministic global training order over the epoch-upsampled
    // corpus: seeded hash permutation, copies of a doc interleaved.
    Q("q_train_order",
      (s, dir) => TrainingData.trainingOrder(
          TrainingData.repeatByWeight(
            docs(s, dir).select("doc_id", "lang"), "lang", Map("en" -> 2)),
          Seq(col("doc_id"), col("copy")), "42")
        .select("doc_id", "copy", "order_key"),
      Some(s"""WITH r AS (SELECT doc_id,
              |    CAST(unnest(range(CASE WHEN lang = 'en' THEN 2 ELSE 1 END)) AS INT) AS copy
              |  FROM documents)
              |SELECT doc_id, copy,
              |  ${h60("'42:' || CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)")} AS order_key
              |FROM r ORDER BY order_key, doc_id, copy""".stripMargin)),

    // Multimodal plumbing: binary payload + typed metadata (the decode
    // itself is stubbed; see ext/Multimodal.scala).
    Q("q_binary_meta",
      (s, dir) => Multimodal.asMedia(docs(s, dir), "doc_id", "text")
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.digest").as("digest"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS digest
             |FROM documents ORDER BY media_id""".stripMargin)),

    // Raw binary-file ingestion: a 20% doc slice staged as one .bin
    // file each, read back through Spark's binaryFile source —
    // identity (filename), size, and digest must survive the
    // bytes-on-disk round trip (oracle recomputes all three from the
    // source rows; the trip is lossless by construction).
    Q("q_binary_files",
      (s, dir) => {
        val tmp = stagingDir("graft_bin_")
        val it = docs(s, dir).filter(col("doc_id") % 5 === 0)
          .select("doc_id", "text").toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, s"${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        CoreQueries.releaseStaged(tmp)(
          graft.io.Sources.readBinaryFiles(s, tmp, pathGlob = "*.bin")
            .select(
              regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long")
                .as("media_id"),
              col("length").as("n_bytes"),
              md5(col("content")).as("digest"))
            .orderBy("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS digest
             |FROM documents WHERE doc_id % 5 = 0
             |ORDER BY media_id""".stripMargin)),

    // Media decode through the real mapPartitions plumbing (text bytes
    // aren't images, so the ImageIoCodec default falls back to the
    // deterministic stub decode). The stub's byte arithmetic IS
    // SQL-expressible — the corpus is ASCII, so byte (f*featDim) % n is
    // ord(substr(..)) and the FLOAT math is replayed with REAL casts —
    // which upgrades this from rows-only to a full exact-match oracle.
    Q("q_media_features",
      (s, dir) => {
        val media = Multimodal.asMedia(docs(s, dir), "doc_id", "text")
        Multimodal.extractFeatures(media, nFrames = 2, featDim = 4)
          .toDF()
          .select(col("media_id"), col("frame_idx"),
            round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH base AS (SELECT doc_id AS media_id, text,
             |    octet_length(encode(text)) AS n FROM documents),
             |fr AS (SELECT media_id, text, n,
             |    unnest(range(0, least(2, 1 + n // 64))) AS frame_idx FROM base)
             |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             |  round(CAST(CASE WHEN n = 0 THEN CAST(-0.5 AS REAL)
             |    ELSE CAST(CAST(ord(substr(text, CAST((frame_idx * 4) % n AS INT) + 1, 1)) AS REAL)
             |         / CAST(255 AS REAL) AS REAL) - CAST(0.5 AS REAL) END AS DOUBLE), 6) AS f0
             |FROM fr ORDER BY media_id, frame_idx""".stripMargin)),

    // REAL audio decode through the same one-pass plumbing: even
    // doc_ids become deterministic PCM16 WAV payloads (44-byte RIFF
    // header + LE samples, synthWavBytes), odd ids stay opaque text
    // bytes — ONE extractFeatures pass routes each row through
    // MediaIoCodec's magic-byte sniff (WAV → javax.sound.sampled
    // parse, else stub). The WAV samples are integer-arithmetic
    // deterministic, so the oracle replays header-derived width(=
    // segment sample count)/height(=sample rate) AND the amplitude
    // histogram — a wrong PCM parse cannot hash-match.
    Q("q_media_audio",
      (s, dir) => {
        import s.implicits._
        val media = docs(s, dir).select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            val bytes =
              if (id % 2 == 0) Multimodal.synthWavBytes(id, nSamples = 200, sampleRate = 8000)
              else text.getBytes("UTF-8")
            (id, bytes)
          }.toDF("media_id", "content")
        Multimodal.extractFeatures(media, nFrames = 2, featDim = 4).toDF()
          .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
            round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH wav AS (
             |  SELECT media_id, i,
             |    ((media_id * 2654435761 + i * 40503) % 65536) - 32768 AS sample
             |  FROM (SELECT doc_id AS media_id, unnest(range(0, 200)) AS i
             |        FROM documents WHERE doc_id % 2 = 0)),
             |wavf AS (
             |  SELECT media_id, CAST(i // 100 AS INT) AS frame_idx,
             |    CAST(100 AS INT) AS width, CAST(8000 AS INT) AS height,
             |    round(CAST(CAST(coalesce(SUM(CASE WHEN ((sample + 32768) * 4) // 65536 = 0
             |        THEN 1 END), 0) AS REAL) / CAST(100 AS REAL) AS DOUBLE), 6) AS f0
             |  FROM wav GROUP BY media_id, i // 100),
             |base AS (SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
             |         FROM documents WHERE doc_id % 2 = 1),
             |fr AS (SELECT media_id, text, n,
             |    unnest(range(0, least(2, 1 + n // 64))) AS frame_idx FROM base),
             |stubf AS (
             |  SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             |    CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
             |    round(CAST(CASE WHEN n = 0 THEN CAST(-0.5 AS REAL)
             |      ELSE CAST(CAST(ord(substr(text, CAST((frame_idx * 4) % n AS INT) + 1, 1)) AS REAL)
             |           / CAST(255 AS REAL) AS REAL) - CAST(0.5 AS REAL) END AS DOUBLE), 6) AS f0
             |  FROM fr)
             |SELECT * FROM wavf UNION ALL SELECT * FROM stubf
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // Unicode NFC canonicalization — the pass every multilingual
    // corpus runs before hashing (precomposed vs decomposed "é" are
    // different bytes to every digest downstream). The fixture
    // decomposes every 'a' into a + U+0301 in the text prefix, then
    // normalizes: NFC recomposes to 'á', shrinking the codepoint
    // count by exactly the injected accents. Oracle = DuckDB's
    // utf8proc nfc_normalize over the identical construction.
    Q("q_nfc_normalize",
      (s, dir) => {
        import graft.functions.UnicodeFunctions.nfc_normalize
        // decomposed a + COMBINING ACUTE, via escape so the source
        // stays ASCII and no editor pre-composes it
        val dec = regexp_replace(substring(col("text"), 1, 30), "a",
          "a\u0301")
        docs(s, dir).select(
            col("doc_id"),
            nfc_normalize(dec).as("nfc"),
            length(dec).as("len_before"),
            length(nfc_normalize(dec)).as("len_after"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  nfc_normalize(replace(substr(text, 1, 30), 'a', 'a' || chr(769))) AS nfc,
             |  CAST(length(replace(substr(text, 1, 30), 'a', 'a' || chr(769))) AS INT) AS len_before,
             |  CAST(length(nfc_normalize(replace(substr(text, 1, 30), 'a', 'a' || chr(769)))) AS INT) AS len_after
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Entity resolution: multi-pass blocked fuzzy join (prefix-2 +
    // suffix-2 blocking, codegen'd Jaro-Winkler verify at τ=0.9).
    // Fixture: the corpus matched against a deterministically
    // corrupted twin of itself (every 10th byte of the 40-char key
    // deleted — the typo model), so ground truth is id_l = id_r and
    // the oracle replays the identical blocking + DuckDB's own
    // jaro_winkler_similarity (bit-equal to graft.functions.StringSim;
    // no rounding tricks needed, the threshold runs on raw doubles on
    // both engines).
    Q("q_fuzzy_match",
      (s, dir) => {
        val clean = docs(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("k"))
        val dirty = docs(s, dir).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"),
            regexp_replace(substring(col("text"), 1, 40), "(.{9}).", "$1").as("k"))
        graft.ops.EntityResolution.fuzzyJoin(
            dirty, clean, "doc_id", "k", "doc_id", "k", minSim = 0.9)
          .orderBy("id_l", "id_r")
      },
      Some(erMatchSql + "\nORDER BY id_l, id_r")),

    // Entity resolution, resolved: one winner per dirty record —
    // highest sim, ties to the smallest clean id (rank-1 window over
    // the match set; ranking uses the 6-dp sim both engines emit).
    Q("q_fuzzy_best",
      (s, dir) => {
        val clean = docs(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("k"))
        val dirty = docs(s, dir).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"),
            regexp_replace(substring(col("text"), 1, 40), "(.{9}).", "$1").as("k"))
        graft.ops.EntityResolution.bestMatches(
            graft.ops.EntityResolution.fuzzyJoin(
              dirty, clean, "doc_id", "k", "doc_id", "k", minSim = 0.9))
          .orderBy("id_l")
      },
      Some(s"""WITH $erCandSql,
              |m AS (SELECT id_l, id_r,
              |    round(jaro_winkler_similarity(kd, kc), 6) AS sim
              |  FROM cand WHERE jaro_winkler_similarity(kd, kc) >= 0.9)
              |SELECT id_l, id_r, sim FROM m
              |QUALIFY row_number() OVER (
              |  PARTITION BY id_l ORDER BY sim DESC, id_r) = 1
              |ORDER BY id_l""".stripMargin)),

    // The orthogonal blocking pass, oracle-pinned: same corrupted-twin
    // fixture through the token-signature blocker alone (sorted
    // distinct token initials). On this separator-eating corruption
    // its recall is deliberately partial (SCALE.md §entity-resolution
    // — passes are chosen against the noise model and OR'd); the
    // oracle replays the signature construction exactly.
    Q("q_fuzzy_sig",
      (s, dir) => {
        val clean = docs(s, dir)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("k"))
        val dirty = docs(s, dir).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"),
            regexp_replace(substring(col("text"), 1, 40), "(.{9}).", "$1").as("k"))
        graft.ops.EntityResolution.fuzzyJoin(
            dirty, clean, "doc_id", "k", "doc_id", "k", minSim = 0.9,
            Seq(graft.ops.EntityResolution.tokenSignatureBlocker()))
          .orderBy("id_l", "id_r")
      },
      Some("""WITH clean AS (SELECT doc_id AS id_r, substr(text, 1, 40) AS kc
             |             FROM documents),
             |dirty AS (SELECT doc_id AS id_l,
             |    regexp_replace(substr(text, 1, 40), '(.{9}).', '\1', 'g') AS kd
             |  FROM documents WHERE doc_id % 3 = 0),
             |cand AS (
             |  SELECT id_l, id_r, kd, kc FROM dirty JOIN clean
             |    ON array_to_string(list_sort(list_distinct(list_transform(
             |         string_split(kd, ' '), w -> substr(w, 1, 1))))[1:4], '')
             |     = array_to_string(list_sort(list_distinct(list_transform(
             |         string_split(kc, ' '), w -> substr(w, 1, 1))))[1:4], ''))
             |SELECT id_l, id_r, round(jaro_winkler_similarity(kd, kc), 6) AS sim
             |FROM cand WHERE jaro_winkler_similarity(kd, kc) >= 0.9
             |ORDER BY id_l, id_r""".stripMargin)),

    // Z-order layout: per-cell stats of the Morton-curve layout on
    // (l_partkey, l_suppkey) — the parquet-footer min/max a reader
    // would prune on. Cell assignment is row-local integer math off a
    // 1-row min/max broadcast (normalize → interleave → top-6-bit
    // prefix); the oracle replays the identical bit arithmetic.
    Q("q_zorder_cells",
      (s, dir) => graft.ops.Layout.zorderCellStats(
          Tables(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          bits = ZBits, cellBits = ZCellBits)
        .orderBy("cell"),
      Some(s"""WITH $zCellsSql
              |SELECT cell, count(*) AS n,
              |  CAST(min(l_partkey) AS BIGINT) AS min_x,
              |  CAST(max(l_partkey) AS BIGINT) AS max_x,
              |  CAST(min(l_suppkey) AS BIGINT) AS min_y,
              |  CAST(max(l_suppkey) AS BIGINT) AS max_y
              |FROM zc GROUP BY cell ORDER BY cell""".stripMargin)),

    // Z-order vs single-key range layout under a box predicate: how
    // many cells a min/max-pruning reader must scan. The Z layout
    // prunes on BOTH dimensions; the l_orderkey range layout (the
    // "sorted by insertion key" baseline) correlates with neither, so
    // its every cell spans the full (partkey, suppkey) box and
    // nothing prunes — the measured argument for Z-ordering 100 TB.
    Q("q_zorder_prune",
      (s, dir) => graft.ops.Layout.pruneComparison(
          Tables(s, dir, "lineitem"), "l_partkey", "l_suppkey",
          "l_orderkey", xLo = 100L, xHi = 499L, yLo = 10L, yHi = 49L,
          bits = ZBits, cellBits = ZCellBits),
      Some(s"""WITH $zCellsSql,
              |zst AS (SELECT cell, count(*) AS n,
              |    min(l_partkey) AS min_x, max(l_partkey) AS max_x,
              |    min(l_suppkey) AS min_y, max(l_suppkey) AS max_y
              |  FROM zc GROUP BY cell),
              |zagg AS (SELECT count(*) AS cells_total,
              |    CAST(coalesce(sum(CASE WHEN min_x <= 499 AND max_x >= 100
              |      AND min_y <= 49 AND max_y >= 10 THEN 1 END), 0) AS BIGINT)
              |      AS z_cells_scanned,
              |    CAST(coalesce(sum(CASE WHEN min_x <= 499 AND max_x >= 100
              |      AND min_y <= 49 AND max_y >= 10 THEN n END), 0) AS BIGINT)
              |      AS z_rows_scanned
              |  FROM zst),
              |ns AS (SELECT CAST(min(l_orderkey) AS BIGINT) AS minn,
              |    CAST(max(l_orderkey) AS BIGINT) AS maxn FROM lineitem),
              |nc AS (SELECT l_partkey, l_suppkey,
              |    CAST(floor((l_orderkey - minn) * ${1L << ZCellBits}
              |      / (maxn - minn + 1)) AS BIGINT) AS cell
              |  FROM lineitem, ns),
              |nst AS (SELECT cell, count(*) AS n,
              |    min(l_partkey) AS min_x, max(l_partkey) AS max_x,
              |    min(l_suppkey) AS min_y, max(l_suppkey) AS max_y
              |  FROM nc GROUP BY cell),
              |nagg AS (SELECT
              |    CAST(coalesce(sum(CASE WHEN min_x <= 499 AND max_x >= 100
              |      AND min_y <= 49 AND max_y >= 10 THEN 1 END), 0) AS BIGINT)
              |      AS nat_cells_scanned,
              |    CAST(coalesce(sum(CASE WHEN min_x <= 499 AND max_x >= 100
              |      AND min_y <= 49 AND max_y >= 10 THEN n END), 0) AS BIGINT)
              |      AS nat_rows_scanned
              |  FROM nst),
              |mt AS (SELECT count(*) AS rows_matching FROM lineitem
              |  WHERE l_partkey BETWEEN 100 AND 499
              |    AND l_suppkey BETWEEN 10 AND 49)
              |SELECT cells_total, z_cells_scanned, z_rows_scanned,
              |  nat_cells_scanned, nat_rows_scanned, rows_matching,
              |  CAST(${1L << ZCellBits} AS BIGINT) AS cells_nominal
              |FROM zagg, nagg, mt""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
