package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-8 operators: PMI collocations, cohort retention, cube, hourly
  * correlation. Specs pin the statistical/structural contracts beyond the
  * value hash. */
class AnalyticsBatch8Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("text_collocations: 20 ranked pairs, PMI descends, all support the count floor") {
    val rows = q("text_collocations").collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getLong(2) >= 5L))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3))
      case _ =>
    }
    // a genuinely bound pair scores above independence (pmi > 0)
    assert(rows.head.getDouble(3) > 0)
  }

  test("agg_retention: offset-0 cell equals cohort size and dominates its row") {
    val rows = q("agg_retention").collect()
    assert(rows.nonEmpty)
    val cohortSizes = {
      val e = Tables.eventsTsUs(spark, sf)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        .groupBy(col("cohort")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    rows.groupBy(_.getLong(0)).foreach { case (cohort, rs) =>
      val zero = rs.find(_.getLong(1) == 0L).get.getLong(2)
      assert(zero === cohortSizes(cohort), "day-0 cell is the whole cohort by definition")
      assert(rs.forall(_.getLong(2) <= zero), "no offset can exceed the cohort size")
    }
  }

  test("agg_cube: the four grouping-set levels are mutually consistent, one scan") {
    val df = q("agg_cube")
    val rows = df.collect()
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1)).head.getLong(2)
    assert(rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum === total)
    assert(rows.filter(r => r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum === total,
      "the per-day slice rollup cannot emit must also conserve mass")
    assert(rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum === total)
    // fresh plan, pre-execution: the post-collect AQE-finalized string
    // repeats the scan inside reuse markers and would miscount
    val plan = q("agg_cube").queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 === 1, "cube must scan the fact once")
    assert(plan.contains("Expand"), "cube must expand grouping sets, not union scans")
  }

  test("scan_schema_evolution: merged read carries the union schema; absent columns are NULL") {
    val df = q("scan_schema_evolution")
    assert(df.columns.toSeq === Seq("doc_id", "lang", "n_chars", "batch"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val odd = r.getLong(0) % 2 == 1
      assert(r.isNullAt(2) === !odd, "n_chars exists exactly where batch 1 wrote it")
      assert(r.getLong(3) === (if (odd) 1L else 0L))
    }
  }

  test("agg_corr: one row per unordered type pair, r in [-1,1], and corr(x,x)=1 sanity") {
    val rows = q("agg_corr").collect()
    val types = Tables.events(spark, sf).select(col("event_type")).distinct().count().toInt
    assert(rows.length === types * (types - 1) / 2)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      assert(r.getLong(3) > 0)
    }
    import spark.implicits._
    val self = Seq((1L, 2.0), (2L, 5.0), (3L, 9.0)).toDF("h", "n")
      .agg(corr(col("n"), col("n"))).head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }
}
