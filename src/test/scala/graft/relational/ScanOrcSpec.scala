package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC round-trip + the scan-economics claim: a filter on the read-back
  * reaches the ORC scan as a pushed predicate (stripe min/max pruning at
  * scale), and values survive the round-trip exactly. */
class ScanOrcSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("round-trip identity and filter pushdown into the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("orcspec").toString
    val src = (1L to 100L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    src.coalesce(1).write.mode("overwrite").orc(s"$dir/docs")
    val back = spark.read.orc(s"$dir/docs")
    assert(back.orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === (1L to 100L).map(i => (i, s"text$i")))
    val filtered = back.filter(col("doc_id") > 90L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(doc_id,90)"),
      s"doc_id filter not pushed into the ORC scan:\n$plan")
    assert(filtered.count() === 10L)
  }

  test("registered scan_orc query equals the parquet source on the fixture") {
    val viaOrc = graft.SparkEntry.queries("scan_orc")(spark, "/root/testdata/sf0.001")
    val direct = Tables.tbl(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
      .orderBy(col("doc_id"))
    assert(viaOrc.collect().toSeq === direct.collect().toSeq)
  }
}
