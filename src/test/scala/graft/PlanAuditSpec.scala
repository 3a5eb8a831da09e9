package graft

/** Plan-level regression guard over every driver-contract query: a code
  * change that silently degrades a join into an unconditional cartesian
  * product would pass row-level correctness at sf0.001 and explode at
  * scale — catch it in the plan, not in production.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no driver query plans a CartesianProduct") {
    graft.functions.NativeExpressions.register(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin with a bounded broadcast side (ann1's
      // 8-query x corpus scoring) is intentional; an unconditioned
      // CartesianProduct never is
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("filter queries push predicates into the parquet scan") {
    val plan = SparkEntry.queries("f1_filter_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"), s"no pushed filters:\n$plan")
  }

  test("projection queries prune the read schema") {
    val plan = SparkEntry.queries("p1_rename_project")(spark, dir)
      .queryExecution.executedPlan.toString
    // customer has 5 columns; the query selects 3 — the scan must too
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"scan not pruned:\n$plan")
  }
}
