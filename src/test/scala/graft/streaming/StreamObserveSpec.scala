package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-observability contract the single-batch gate can't see:
  * observed metrics surface PER MICRO-BATCH in the progress events and
  * fold additively across them. */
class StreamObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observed metrics accumulate across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Option[Double])]
    val observed = input.toDS().toDF("id", "value").observe("qc",
      count(lit(1)).as("n_rows"),
      count(when(col("value").isNull, 1)).as("n_null"))
    val qname = "sobs_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = observed.groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    try {
      input.addData((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      q.processAllAvailable()
      input.addData((4L, None), (5L, None))
      q.processAllAvailable()
      val ms = q.recentProgress.toSeq.flatMap(p => Option(p.observedMetrics.get("qc")))
      assert(ms.size >= 2, "each data-bearing micro-batch reports its own metrics")
      val rows = ms.map(r => if (r.isNullAt(0)) 0L else r.getLong(0)).sum
      val nulls = ms.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum
      assert(rows === 5L)
      assert(nulls === 3L)
      // and a per-batch slice is visible, not only the total
      assert(ms.map(r => r.getLong(0)).toSet === Set(3L, 2L))
    } finally { q.stop(); spark.catalog.dropTempView(qname) }
  }
}
