package graft

/** Scale guardrail over the WHOLE registry: no query may plan a
  * cartesian product or an unintended nested-loop join — the two
  * shapes that stop scaling first. Every future registry entry is
  * covered automatically; intentional exceptions are listed with the
  * reason they are allowed.
  */
class PlanGuardSpec extends SparkSpec {

  /** Plans that legitimately contain a BroadcastNestedLoopJoin or
    * cartesian and why:
    * - q_embed_neardup: the documented all-pairs oracle BASELINE; the
    *   registered scale path is q_embed_neardup_lsh.
    * - q_ann_topk: brute-force exact baseline — the non-equi
    *   (id =!= query_id) join against the broadcast QUERY side is the
    *   intended "scan corpus once" plan, not a corpus×corpus loop.
    */
  private val allowed = Set("q_embed_neardup", "q_ann_topk")

  test("no registry query plans CartesianProduct or unintended nested-loop join") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowed(name) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
      case _ => None
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }

  test("no registry query leaves temp views behind in the session catalog") {
    val sfDir = "/root/testdata/sf0.001"
    def views(): Set[String] =
      spark.catalog.listTables().collect().map(_.name).toSet
    val before = views()
    val leakers = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sfDir) // building the plan is where registration happens
        val leaked = views() -- before
        leaked.foreach(spark.catalog.dropTempView) // isolate per query
        if (leaked.nonEmpty) Some(s"$name: ${leaked.mkString(", ")}") else None
    }
    withClue(leakers.mkString("\n")) { leakers shouldBe empty }
  }
}
