package graft

/** Fleet-wide plan guard: no operator may plan an unbounded pair
  * product. A CartesianProduct is never acceptable; a
  * BroadcastNestedLoopJoin is acceptable only where one side is bounded
  * by construction (the fixed query set / centroid table the operator
  * broadcasts on purpose) — those are allowlisted explicitly so a new
  * operator that accidentally theta-joins fails here before it ships. */
class PlanAuditSpec extends SparkSpec {

  /** Ops whose plan legitimately contains a BNLJ over a
    * bounded-by-construction broadcast side. */
  private val boundedBnlj = Set(
    "s_cosine_topk", // fixed nQueries query vectors × corpus
    "s_ivf_ann",     // NumLists centroids × corpus (assignment cross)
    "s_kmeans"       // KmeansK centroids × corpus (assignment cross)
  )

  test("no operator plans a cartesian product; BNLJ only where bounded") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SF).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !boundedBnlj(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: unallowlisted BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
