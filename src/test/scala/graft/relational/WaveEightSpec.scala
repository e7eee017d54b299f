package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Point-in-time join and incremental aggregate merge (round-8 wave 8).
  * Oracle parity runs at the gate; these pin the leakage rule (no future
  * dimension version ever assigned), the merge-pass plan shape (one
  * exchange, no join operator), and partial+partial = full associativity
  * under arbitrary splits.
  */
class WaveEightSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("join_point_in_time: assigned version is the latest STRICTLY-before signup") {
    val rows = AnalyticsQueries.queries("join_point_in_time")(spark, sf).collect()
    assert(rows.nonEmpty)
    val e = Tables.eventsTsUs(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .collect()
    val signups = e.filter(_.getString(3) == "signup")
      .groupBy(_.getLong(1))
      .map { case (u, rs) => u -> rs.sortBy(r => (r.getLong(2), r.getLong(0))) }
    def before(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    rows.foreach { r =>
      val (eid, u, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val prior = signups.getOrElse(u, Array.empty[org.apache.spark.sql.Row])
        .filter(s => before((s.getLong(2), s.getLong(0)), (ts, eid)))
      if (prior.isEmpty) {
        assert(r.isNullAt(3) && !r.getBoolean(5), s"purchase $eid: no prior signup -> null")
      } else {
        val last = prior.last
        assert(r.getLong(4) === last.getLong(0), s"purchase $eid: latest prior signup wins")
        assert(r.getLong(3) === math.floor(last.getDouble(4) / 25.0).toLong,
          s"purchase $eid: tier of that signup")
        assert(r.getBoolean(5))
        // LEAKAGE GUARD: the assigned signup must never postdate the fact
        assert(before((last.getLong(2), last.getLong(0)), (ts, eid)))
      }
    }
  }

  test("join_point_in_time plan: merge-pass, not a join") {
    val plan = AnalyticsQueries.queries("join_point_in_time")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"PIT assignment must be the union-window form:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one exchange on user_id:\n$plan")
  }

  test("agg_incremental_merge: partial+partial equals full, under any split") {
    val merged = AnalyticsQueries.queries("agg_incremental_merge")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = Tables.eventsTsUs(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 1e6) as long)")).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getLong(2).toDouble / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(_._1)
    assert(merged.toSeq === full.toSeq, "re-aggregated partials equal the full recompute")
  }
}
