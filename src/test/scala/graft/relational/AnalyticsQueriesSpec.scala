package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The warehouse-analytics family (AnalyticsQueries): salted skew join,
  * rollup, pivot, event-time windows. Each query's oracle parity runs at
  * the gate; these specs pin the properties the hash can't see — the plan
  * shapes (salting actually present, no broadcast; one aggregate for
  * rollup) and the value-identity of the salted join to its unsalted form.
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("join_skew_salted equals the plain unsalted join, value for value") {
    val salted = q("join_skew_salted").collect().map(_.toSeq).toSet
    val e = Tables.events(spark, sf)
    val dim = e.groupBy(col("event_type")).agg(round(avg(col("value")), 6).as("type_avg"))
    val plain = e.join(dim, "event_type")
      .select(col("event_id"), col("event_type"), col("value"), col("type_avg"),
        round(col("value") - col("type_avg"), 6).as("diff"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("join_skew_salted plan: shuffled hash join on (event_type, salt), no broadcast") {
    val plan = q("join_skew_salted").queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected shuffled hash join in:\n$plan")
    assert(plan.toLowerCase.contains("salt"), "salt key missing from join")
    assert(!plan.contains("BroadcastHashJoin"), "skew demo must not broadcast the dim")
  }

  test("agg_rollup: detail + subtotal + grand total levels are consistent") {
    val rows = q("agg_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val total = grand.head.getLong(2)
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(subtotals.map(_.getLong(2)).sum === total)
    val details = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(details.map(_.getLong(2)).sum === total)
    // one pass: the expand feeds a single hash aggregate, not one scan per level
    val plan = q("agg_rollup").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup should expand grouping sets:\n$plan")
    assert(plan.split("Scan parquet").length - 1 === 1, "rollup must scan the fact once")
  }

  test("agg_pivot: per-user counts sum to the user's event count; absent combos are 0") {
    val rows = q("agg_pivot").collect()
    assert(rows.nonEmpty)
    val totals = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = (1 to 5).map(r.getLong).sum
      assert(s === totals(r.getLong(0)), s"pivot row ${r.getLong(0)} sums to $s")
    }
  }

  test("window_moving_avg: 1h frame contains the row itself; n_1h bounded by user history") {
    val rows = q("window_moving_avg").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(5) >= 1L), "RANGE frame must include current row")
    // a singleton frame's average is the value itself
    val singletons = rows.filter(_.getLong(5) == 1L)
    assert(singletons.nonEmpty)
    singletons.foreach(r =>
      assert(math.abs(r.getDouble(4) - math.rint(r.getDouble(3) * 1e6) / 1e6) < 1e-9))
  }

  test("window_lag_delta: gaps are non-negative and first-in-user rows are null") {
    val rows = q("window_lag_delta").collect()
    assert(rows.nonEmpty)
    assert(rows.filter(!_.isNullAt(3)).forall(_.getLong(3) >= 0L),
      "ordered by ts_us, gaps cannot be negative")
    val users = rows.map(_.getLong(1)).distinct.length
    assert(rows.count(_.isNullAt(3)) === users, "exactly one frame-start null per user")
  }
}
