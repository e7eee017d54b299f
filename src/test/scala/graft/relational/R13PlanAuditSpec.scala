package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits for the round-13 operators — the properties that make
  * them 100-TB-safe, asserted against the executed plan so a regression
  * (a lost broadcast hint, a surprise cartesian) fails the suite, not a
  * profiler session later. */
class R13PlanAuditSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("modularity and conductance: keyed joins only — no cartesian, no nested loop") {
    for (q <- Seq("graph_modularity", "graph_conductance")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian")
      // the only nested-loop is the broadcast of the 1-row m total —
      // every per-community relation must equi-join
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nlj <= 2, s"$q has $nlj nested-loop joins (expected only 1-row-total broadcasts)")
    }
  }

  test("hybrid fusions: nothing corpus-sized past the memoized legs") {
    for (q <- Seq("search_hybrid_rrf", "search_hybrid_weighted")) {
      val plan = planOf(q)
      // both serve from the leg parquet: the plan must not re-scan
      // documents or embeddings (the legs were scored once at build time)
      assert(!plan.contains("documents.parquet"), s"$q re-scans the corpus text")
      assert(!plan.contains("embeddings.parquet"), s"$q re-scans the embeddings")
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian")
    }
  }

  test("text_decontaminate_fuzzy: band-keyed candidate join, no pairwise doc scan") {
    val plan = planOf("text_decontaminate_fuzzy")
    assert(!plan.contains("CartesianProduct"), "decontaminate grew a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "candidates must equi-join on (band, bucket)")
  }

  test("similarity_range: the 10-probe broadcast is the ONLY nested loop (the intended scan)") {
    val plan = planOf("similarity_range")
    // fixed-threshold range over a 10-probe set IS a broadcast linear
    // scan by design — assert it broadcasts (not a shuffled cartesian)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "probe set must broadcast")
    assert(!plan.contains("CartesianProduct"), "probe scan must not shuffle-cartesian")
  }
}
