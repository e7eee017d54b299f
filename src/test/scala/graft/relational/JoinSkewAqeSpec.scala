package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** join_skew_aqe: the oracle gates the joined aggregate's values; this
  * spec pins what the oracle cannot see — that AQE really recognized the
  * hot partition and split it at runtime. */
class JoinSkewAqeSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withSkewConfs[T](body: => T): T = {
    // the REGISTERED query's conf list — a tuning there re-certifies here
    val confs = AnalyticsQueries.SkewAqeConfs
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's shuffle partition (skew marker in the finalized plan)") {
    withSkewConfs {
      val probe = AnalyticsQueries.skewAqeJoined(spark, sf)
      probe.collect() // finalize the adaptive plan
      val plan = probe.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("skew"),
        s"expected an AQE skew split in the finalized plan:\n${plan.take(4000)}")
    }
  }

  test("join_skew_aqe values equal a direct recompute (the join is values-neutral)") {
    val rows = AnalyticsQueries.queries("join_skew_aqe")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hot = rows.find(_.getLong(0) == 0L).get
    val total = rows.map(_.getLong(1)).sum
    assert(hot.getLong(1) >= (total * 0.75).toLong, "80% of events collapse onto key 0")
    val direct = Tables.events(spark, sf)
      .withColumn("hot_key",
        // sign-preserving %, same as the registered query and the oracle —
        // pmod would diverge on a negative user_id fixture
        when(col("event_id") % 10 < 8, lit(0L)).otherwise(col("user_id") % 50L))
      .groupBy(col("hot_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === direct(r.getLong(0))))
  }
}
