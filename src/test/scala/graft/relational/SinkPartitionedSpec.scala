package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of a partitioned sink is that later filters on the partition
  * column become DIRECTORY pruning — this spec asserts the plan, not just
  * the values (the gate's DuckDB oracle already pins those). */
class SinkPartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a filter on the partition column prunes to that partition's files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("partspec").toString
    Seq((0L, "en", 10L), (1L, "de", 20L), (2L, "en", 30L), (3L, "fr", 40L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/docs")

    val q = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("isnotnull(lang"), s"partition filter not pushed:\n$plan")

    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 10L), (2L, 30L)))

    // de/fr partitions contribute ZERO scanned partition directories — the
    // scan's own metrics, read after execution
    val scans = q.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, plan)
    val partsRead = scans.map(_.metrics("numPartitions").value).sum
    assert(partsRead == 1L, s"expected 1 pruned partition dir, read $partsRead:\n$plan")
  }
}
