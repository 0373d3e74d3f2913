package graft

import graft.ext.GraphRank

/** Integer PageRank: hand-computed power-iteration trace on a path
  * graph, isolated-node teleport floor, layout determinism, and the
  * mass-conservation sanity bound.
  */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)], iters: Int) =
    GraphRank.pagerankMicro(
        nodes.toDF("id"), pairs.toDF("id_a", "id_b"), iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("hand-computed trace on the path graph a-b-c (+isolated d)") {
    // deg: a=1 b=2 c=1; r0 = 1e6 each
    // iter1: a <- floor(85e6/200)=425000 -> 575000
    //        b <- 2*floor(85e6/100)=1700000 -> 1850000 ; c = 575000
    // iter2: a <- floor(85*1850000/200)=786250 -> 936250
    //        b <- 2*floor(85*575000/100)=2*488750 -> 1127500 ; c = 936250
    run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)), iters = 1) shouldBe
      Seq((1L, 1L, 575000L), (2L, 2L, 1850000L), (3L, 1L, 575000L),
        (4L, 0L, 150000L))
    run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)), iters = 2) shouldBe
      Seq((1L, 1L, 936250L), (2L, 2L, 1127500L), (3L, 1L, 936250L),
        (4L, 0L, 150000L))
  }

  test("star center out-ranks leaves; rank is layout-deterministic") {
    val nodes = (1L to 6L).toSeq
    val pairs = (2L to 6L).map(l => (1L, l))
    val a = run(nodes, pairs, iters = 5)
    val center = a.find(_._1 == 1L).get._3
    a.filter(_._1 != 1L).foreach { case (_, d, r) =>
      d shouldBe 1L
      r should be < center
    }
    // same graph, shuffled input layout → identical ranks (integer
    // sums are partition-order-free)
    val b = GraphRank.pagerankMicro(
        nodes.toDF("id").repartition(5),
        pairs.toDF("id_a", "id_b").repartition(3), iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    b shouldBe a
  }

  test("survivors: local maxima win, equal-rank ties go to lower id") {
    def survivors(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Seq[Long] =
      GraphRank.pagerankSurvivors(
          nodes.toDF("id"), pairs.toDF("id_a", "id_b"), iters = 5)
        .collect().map(_.getLong(0)).sorted.toSeq
    // path a-b-c: center b out-ranks both ends; isolated d survives
    survivors(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L))) shouldBe
      Seq(2L, 4L)
    // symmetric pair: equal ranks → lower id survives
    survivors(Seq(1L, 2L), Seq((1L, 2L))) shouldBe Seq(1L)
    // two separate components each keep their own center
    survivors(Seq(1L, 2L, 3L, 10L, 11L, 12L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))) shouldBe
      Seq(2L, 11L)
  }

  test("mass never exceeds the closed-form ceiling") {
    // with floor-division leakage, total rank after any iteration is
    // ≤ N·(teleport + damping·1e6) and ≥ N·teleport
    val nodes = (1L to 8L).toSeq
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 6L))
    val rows = run(nodes, pairs, iters = 5)
    val total = rows.map(_._3).sum
    total should be <= nodes.length * 1000000L
    total should be >= nodes.length * 150000L
  }
}
