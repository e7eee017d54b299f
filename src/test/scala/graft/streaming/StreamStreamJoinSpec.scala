package graft.streaming

import graft.TestSpark
import graft.relational.DataPipelineQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the stream-stream interval join: a side
  * must BUFFER in state until its match arrives in a later micro-batch,
  * the range predicate must reject out-of-window pairs, and inner rows
  * must emit without any flush sentinel. */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val H = 3600000000L

  private def harness() = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Long)] // (p_id, user_id, ts_us)
    val vIn = MemoryStream[(Long, Long, Long)]
    val p = pIn.toDS().toDF("p_id", "user_id", "ts_us")
      .select(col("p_id"), col("user_id"), timestamp_micros(col("ts_us")).as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val v = vIn.toDS().toDF("v_id", "v_user", "ts_us")
      .select(col("v_id"), col("v_user"), timestamp_micros(col("ts_us")).as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val qname = "ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = DataPipelineQueries.attributionJoin(p, v)
      .writeStream.format("memory").queryName(qname).outputMode("append").start()
    (pIn, vIn, query, qname)
  }

  test("a view buffered in state matches a purchase arriving in a LATER micro-batch") {
    val (pIn, vIn, query, qname) = harness()
    try {
      vIn.addData((100L, 7L, 10L * 60 * 1000000))
      query.processAllAvailable()
      assert(spark.table(qname).isEmpty, "no purchase yet, nothing to emit")
      pIn.addData((200L, 7L, 30L * 60 * 1000000))
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows === Seq((200L, 100L, 7L, 20L * 60 * 1000000)),
        s"cross-batch buffering broken: $rows")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("range predicate: views outside the trailing hour or after the purchase never match") {
    val (pIn, vIn, query, qname) = harness()
    try {
      // same user: one view 2h before (too old), one after the purchase
      // (wrong direction), one exactly at the boundary (inclusive)
      vIn.addData((1L, 5L, 0L), (2L, 5L, 3L * H), (3L, 5L, 2L * H - H))
      pIn.addData((9L, 5L, 2L * H))
      query.processAllAvailable()
      val rows = spark.table(qname).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows === Seq((9L, 3L)), s"range filtering broken: $rows")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }
}
