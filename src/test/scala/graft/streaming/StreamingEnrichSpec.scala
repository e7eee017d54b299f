package graft.streaming

import graft.TestSpark
import graft.relational.DataPipelineQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateless stream-static broadcast join: every micro-batch enriches
  * immediately (append mode, no watermark, no state), unmatched stream rows
  * survive the left join, and the plan stays a broadcast join (no shuffle
  * added by streaming). */
class StreamingEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rows enrich per micro-batch, emit immediately, unmatched keys keep nulls") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDS().toDF("event_id", "event_type", "value")
    val dim = Seq(("a", 10.0), ("b", 20.0)).toDF("event_type", "type_avg")
    val qname = "senr_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = DataPipelineQueries.enrichWithDim(events, dim)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      input.addData((1L, "a", 15.0), (2L, "b", 5.0))
      query.processAllAvailable()
      // stateless: batch 1's rows are already out, no closer row needed
      val b1 = spark.table(qname).collect().map(_.getLong(0)).toSet
      assert(b1 == Set(1L, 2L), s"append-mode emission held back: $b1")
      input.addData((3L, "zzz", 1.0)) // no dimension row -> nulls, row kept
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSeq.sortBy(_._1)
      assert(rows == Seq(
        (1L, Some(10.0), Some(true)),
        (2L, Some(20.0), Some(false)),
        (3L, None, None)), s"enrichment values wrong: $rows")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }
}
