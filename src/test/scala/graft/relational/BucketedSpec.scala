package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join proof: two tables bucketed on the same key with the
  * same bucket count must sort-merge-join with ZERO shuffle exchanges —
  * the plan property that makes ingest-time bucketing pay for itself on
  * every later join at 100 TB. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed equi-join plans with no shuffle exchange and matches the shuffled join") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bkt_spec").toString
    val a = (0L until 500L).map(i => (i, s"lang${i % 5}")).toDF("doc_id", "lang")
    val b = (0L until 500L).map(i => (i, i * 7 % 100)).toDF("doc_id", "n_tokens")
    Bucketed.writeBucketed(a, "bkt_spec_a", s"$tmp/a", "doc_id", nBuckets = 4)
    Bucketed.writeBucketed(b, "bkt_spec_b", s"$tmp/b", "doc_id", nBuckets = 4)
    // force the sort-merge path: a broadcast join would also show no
    // exchange, but for the trivial reason that one side ships whole
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.coLocatedJoin(spark, "bkt_spec_a", "bkt_spec_b", "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle (co-location is the point):\n$plan")
      // and the layout must not change semantics: row-for-row equal to the
      // plain shuffled join of the source frames
      val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      val want = a.join(b, "doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got.toSeq == want.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_spec_a")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_b")
    }
  }

  test("registered scan_bucketed query cleans up its catalog entries") {
    val dir = java.nio.file.Files.createTempDirectory("bkt_q").toString
    import spark.implicits._
    Seq((0L, "web", "en", "alpha beta"), (1L, "web", "de", "gamma"))
      .toDF("doc_id", "source", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DataPipelineQueries.queries("scan_bucketed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, "en", 10L, 2L), (1L, "de", 5L, 1L)))
    val leftover = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_bkt_"))
    assert(leftover.isEmpty, s"catalog leak: ${leftover.toSeq}")
  }
}
