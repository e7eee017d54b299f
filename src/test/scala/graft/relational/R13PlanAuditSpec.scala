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

  /** Every physical plan EXECUTED while `body` runs — including the
    * intermediate localCheckpoint materializations a final
    * `queryExecution` can't see (the r13-advice vacuity: a checkpointed
    * query's own plan is just an RDD scan; the real joins execute inside
    * the build). Captured via a QueryExecutionListener and drained
    * through the listener bus before returning. */
  private def plansDuring(body: => Unit): Seq[String] = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      org.apache.spark.sql.graft.ColumnBridge
        .waitListenerBusEmpty(spark.sparkContext, 30000L)
    } finally spark.listenerManager.unregister(l)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("modularity and conductance: keyed joins only — no cartesian, no nested loop") {
    for (q <- Seq("graph_modularity", "graph_conductance")) {
      // audit EVERY plan executed during the build, not just the final
      // (possibly checkpoint-hidden) frame. collect(), NOT count():
      // counting lets Catalyst prune the join payload columns away and
      // the audited joins never execute (measured — count()'s plan was
      // join-free)
      val all = plansDuring(graft.SparkEntry.queries(q)(spark, sf).collect())
      assert(all.nonEmpty, s"$q: no executed plans captured")
      assert(all.exists(_.contains("HashJoin")) || all.exists(_.contains("SortMergeJoin")),
        s"$q: expected a real equi-join among the captured plans")
      all.foreach { plan =>
        assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
        // the only nested-loop is the broadcast of the 1-row m total —
        // every per-community relation must equi-join
        val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        assert(nlj <= 2, s"$q has $nlj nested-loop joins (expected only 1-row-total broadcasts)")
      }
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
    // the gate query returns a localCheckpoint'd frame, so its own
    // executedPlan is an RDD scan — audit every plan the build executes
    val all = plansDuring(
      graft.SparkEntry.queries("text_decontaminate_fuzzy")(spark, sf).collect())
    assert(all.nonEmpty, "no executed plans captured")
    assert(all.exists(_.contains("HashJoin")) || all.exists(_.contains("SortMergeJoin")),
      "expected the (band, bucket) candidate equi-join among the captured plans")
    all.foreach { plan =>
      assert(!plan.contains("CartesianProduct"), s"decontaminate grew a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"candidates must equi-join on (band, bucket):\n$plan")
    }
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
