package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph importance over the near-dup similarity graph: which
  * document in a duplicate neighborhood is the CANONICAL one to keep?
  * Near-dup survivor selection by doc_id or length is arbitrary;
  * PageRank over the similarity graph keeps the document other
  * documents cluster around — the graph-centrality criterion
  * (SimHash/dedup literature's "pick the medoid" heuristic, made
  * global).
  *
  * The rank currency is INTEGER micro-units, not doubles: rank starts
  * at 10⁶, one iteration is
  * `r' = 150000 + Σ_in (85·r_u) div (100·deg_u)` — the damping-0.85
  * power iteration with every term floored into BIGINT. Two reasons:
  *  - a distributed double sum is partition-order-dependent; integer
  *    sums are exact on any layout, so ranks are bit-stable and the
  *    DuckDB oracle replays the full iteration unrolled;
  *  - the floor loses <1 micro-unit per edge per iteration —
  *    irrelevant for an ORDERING statistic (what survivor selection
  *    consumes).
  * Dangling mass is NOT redistributed (isolated docs sit at the
  * 150000 teleport floor after one iteration) — fine for ranking
  * within connected near-dup neighborhoods, which is the use.
  */
object GraphRank {

  /** Fixed-iteration integer PageRank. `nodes` = one `id` column
    * (every document, so isolated docs still get a rank row);
    * `pairs` = undirected similarity edges (id_a, id_b), e.g.
    * [[Dedup.ngramJaccardPairs]]' output. Returns (id, n_neighbors,
    * rank_micro).
    *
    * Scale shape: the edge list and degree table are computed once
    * and localCheckpoint'd (they are reused every iteration — the
    * GraphX lineage-truncation discipline, same as bpeTrain's vocab);
    * each iteration is one equi-join rank⋈edges on `src` + one
    * map-side-combinable groupBy on `dst` — the standard Pregel
    * message round as two shuffles, no driver-side data beyond the
    * plan. Iterations are fixed (default 5), not convergence-tested:
    * survivor selection needs a stable ordering, not ε-convergence,
    * and fixed rounds keep the plan static and the oracle unrollable.
    */
  def pagerankMicro(nodes: DataFrame, pairs: DataFrame,
      iters: Int = 5): DataFrame = {
    val (ids, _, deg, edgesDeg) = prepare(nodes, pairs)
    finish(ids, deg, rankLoop(ids, edgesDeg, iters))
  }

  private case class GraphKey(
      session: org.apache.spark.sql.SparkSession, // identity equality
      nodesPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      pairsPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  /** Bounded memo of the materialized graph, keyed by (session, the
    * canonicalized analyzed plans of nodes and pairs) — STRUCTURAL
    * plan equality, not a plan hash, so a collision can never serve
    * another corpus's graph as output (the [[Dedup]] probe-stats memo
    * tolerates hash keys because its entries only pick a plan; this
    * one's entries ARE the data). Bounded LRU (not weak keys: the
    * cached DataFrames strongly reference their session, which would
    * defeat a WeakHashMap and leak every graph forever): at most
    * [[MaxGraphs]] graphs stay alive, evicted oldest-first, and
    * stopped sessions' entries are purged on access — dropping the
    * reference lets the ContextCleaner unpersist the checkpointed
    * blocks. A session that rewrites the corpus in place can see the
    * old graph until eviction — the same staleness granularity as
    * Spark's own file-index caching.
    */
  private val MaxGraphs = 8
  private val graphMemo =
    new java.util.LinkedHashMap[GraphKey,
        (DataFrame, DataFrame, DataFrame, DataFrame)](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[GraphKey,
            (DataFrame, DataFrame, DataFrame, DataFrame)])
          : Boolean = size() > MaxGraphs
    }

  /** Test hook: live memo entries. */
  private[graft] def graphMemoEntries: Int =
    graphMemo.synchronized(graphMemo.size())

  /** Materialize the graph ONCE: checkpoint pairs FIRST so the
    * reversed-edge union's two branches scan executor blocks, not two
    * runs of the pair job; memoize so the rank and survivor faces
    * share one build. The build runs under the memo lock — callers
    * are the sequential registry faces, and a duplicate concurrent
    * build would cost more than the wait.
    */
  private def prepare(nodes: DataFrame, pairs: DataFrame) =
    graphMemo.synchronized {
      val it = graphMemo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getKey.session.sparkContext.isStopped) it.remove()
      val key = GraphKey(pairs.sparkSession,
        nodes.queryExecution.analyzed.canonicalized,
        pairs.queryExecution.analyzed.canonicalized)
      val hit = graphMemo.get(key)
      if (hit != null) hit
      else {
        val p = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .localCheckpoint()
        val edges = p
          .union(p.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .localCheckpoint()
        // degree-annotated edges, hash-partitioned on src ONCE: deg is
        // iteration-invariant, so joining it per round paid an extra
        // join every iteration, and an unpartitioned edge relation was
        // re-shuffled by every round's rank join — localCheckpoint
        // preserves the partitioning, so each round now shuffles only
        // the (|V|-sized) rank side (guide §2.4: establish the
        // partitioning once, iterate on it)
        val edgesDeg = edges.join(deg, Seq("src"))
          .repartition(col("src")).localCheckpoint()
        val ids = nodes.select(col("id")).localCheckpoint()
        val g = (ids, edges, deg, edgesDeg)
        graphMemo.put(key, g)
        g
      }
    }

  private def rankLoop(ids: DataFrame, edgesDeg: DataFrame,
      iters: Int): DataFrame = {
    var ranks = ids.select(col("id"), lit(1000000L).as("r"))
    var i = 0
    while (i < iters) {
      // inner joins commute: (edges ⋈ deg) ⋈ ranks ≡ the old
      // edges ⋈ ranks ⋈ deg row-for-row (every src has a degree)
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("(85 * r) div (100 * deg)").as("c"))
        .groupBy("id").agg(sum("c").as("c"))
      // LAZY checkpoint: the round's lineage still truncates (each
      // round plans against the previous round's RDD, not a growing
      // DAG) and the blocks still persist, but materialization rides
      // the NEXT round's job instead of paying a standalone job
      // barrier + block-write wall per round (~0.3 s × iters at bench
      // scale, measured via -jobs attribution). The intermediate
      // ranks frame has exactly ONE consumer (the next round), so
      // laziness can never double-compute it.
      ranks = ids
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + coalesce(col("c"), lit(0L))).as("r"))
        .localCheckpoint(eager = false)
      i += 1
    }
    ranks
  }

  private def finish(ids: DataFrame, deg: DataFrame,
      ranks: DataFrame): DataFrame =
    ids
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(ranks, Seq("id"))
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("n_neighbors"),
        col("r").as("rank_micro"))

  /** The USE of the rank: near-dup survivor selection by local
    * centrality. A document is dropped when some similarity-neighbor
    * out-ranks it — strictly higher [[pagerankMicro]] rank, or equal
    * rank and lower id (the deterministic tie) — so each connected
    * neighborhood keeps exactly its local maxima: the docs the
    * neighborhood clusters around. Isolated documents always survive.
    *
    * One extra round over [[pagerankMicro]]'s output: edges ⋈ ranks
    * twice on the edge endpoints (equi-joins), a distinct on the
    * dropped ids, one anti-join — all integer compares, so the oracle
    * replays the drop rule verbatim on top of the unrolled rank CTEs.
    */
  def pagerankSurvivors(nodes: DataFrame, pairs: DataFrame,
      iters: Int = 5): DataFrame = {
    // one graph materialization feeds the rank loop AND the drop rule
    val (ids, edges, deg, edgesDeg) = prepare(nodes, pairs)
    val ranked = finish(ids, deg, rankLoop(ids, edgesDeg, iters))
      .localCheckpoint()
    val dropped = edges
      .join(ranked.select(col("id").as("src"),
        col("rank_micro").as("r_src")), Seq("src"))
      .join(ranked.select(col("id").as("dst"),
        col("rank_micro").as("r_dst")), Seq("dst"))
      .filter(col("r_dst") > col("r_src") ||
        (col("r_dst") === col("r_src") && col("dst") < col("src")))
      .select(col("src").as("id")).distinct()
    ranked.join(dropped, Seq("id"), "left_anti")
  }
}
