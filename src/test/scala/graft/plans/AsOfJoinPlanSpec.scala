package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-LogicalPlan contracts: the node is visible in the analyzed
  * plan (a first-class declarative operator), GONE after optimization
  * (the lowering rule fired), the results equal the directly-composed
  * route bit-for-bit, and rule registration is idempotent. */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark

  private def inputs() = {
    import spark.implicits._
    val e = Seq(
      (1L, "a", 100L), (2L, "a", 250L), (3L, "b", 90L), (4L, "a", 5000L)
    ).toDF("event_id", "event_type", "ts_us")
    val r = Seq(
      ("a", 50L, 10L), ("a", 240L, 11L), ("b", 95L, 12L)
    ).toDF("event_type", "ts_us", "ref_id")
    (e, r)
  }

  test("node in analyzed plan, lowered out of optimized plan, values match the composition") {
    val (e, r) = inputs()
    val viaNode = AsOfJoinPlan.asof(e, r, "event_type", 1000L)
    assert(viaNode.queryExecution.analyzed.collect { case _: AsOfJoin => 1 }.nonEmpty,
      "the operator must be first-class in the analyzed plan")
    assert(viaNode.queryExecution.optimizedPlan.collect { case _: AsOfJoin => 1 }.isEmpty,
      "the lowering rule must have replaced it before planning")
    val direct = graft.relational.RelationalQueries
      .asofBucketed(e, r, "event_type", 1000L)
    val a = viaNode.orderBy("event_id").collect().map(_.toString).toSeq
    val b = direct.orderBy("event_id").collect().map(_.toString).toSeq
    assert(a === b)
    // semantics spot check: event 2 (ts 250) sees ref 11 (ts 240); event 3
    // (ts 90, type b) precedes b's only ref and keeps nulls
    val rows = viaNode.orderBy("event_id").collect()
    assert(rows(1).getLong(3) === 11L)
    assert(rows(2).isNullAt(3))
  }

  test("a column-free consumer (count) does not prune the node's children hollow") {
    // regression: without declared references, ColumnPruning under a
    // count() left the lowering rule empty child Projects to resolve
    // against (UNRESOLVED_COLUMN at optimization time)
    val (e, r) = inputs()
    assert(AsOfJoinPlan.asof(e, r, "event_type", 1000L).count() === 4L)
  }

  test("rule registration is idempotent across repeated API calls") {
    val (e, r) = inputs()
    AsOfJoinPlan.asof(e, r, "event_type", 1000L).collect()
    AsOfJoinPlan.asof(e, r, "event_type", 1000L).collect()
    val n = spark.experimental.extraOptimizations.count(_.isInstanceOf[LowerAsOfJoin])
    assert(n === 1)
  }

  test("a non-string key resolves: the minted key attribute takes the left child's type") {
    // regression: the key attribute was hardwired StringType, so a bigint
    // key declared a node schema the lowered plan never produced and
    // parents hit internal analysis errors
    import spark.implicits._
    val e = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 8L, 90L))
      .toDF("event_id", "k", "ts_us")
    val r = Seq((7L, 50L, 10L), (7L, 240L, 11L), (8L, 95L, 12L))
      .toDF("k", "ts_us", "ref_id")
    val out = AsOfJoinPlan.asof(e, r, "k", 1000L)
    assert(out.schema("k").dataType === org.apache.spark.sql.types.LongType)
    val rows = out.orderBy("event_id").collect()
    assert(rows(1).getLong(3) === 11L, "event 2 (ts 250, k=7) sees ref 11 (ts 240)")
    assert(rows(2).isNullAt(3), "event 3 (ts 90, k=8) precedes k=8's only ref")
    // and a projection through the minted attribute keeps resolving
    assert(out.select(col("k") + 1).count() === 3L)
  }

  test("node survives tree copies without re-minting output attribute ids") {
    val (e, r) = inputs()
    val node = AsOfJoin(e.queryExecution.analyzed, r.queryExecution.analyzed,
      "event_type", 1000L)
    val copied = node.withNewChildren(Seq(node.left, node.right))
    assert(copied.asInstanceOf[AsOfJoin].output.map(_.exprId)
      === node.output.map(_.exprId))
  }
}
