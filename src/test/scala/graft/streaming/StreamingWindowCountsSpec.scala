package graft.streaming

import graft.TestSpark
import graft.relational.DataPipelineQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the tumbling-window counter: a window must
  * ACCUMULATE across micro-batches in state, emit exactly once when the
  * watermark passes its end, and hold open windows back until then. */
class StreamingWindowCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def harness() = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val events = input.toDS().toDF("event_type", "ts_us")
      .select(col("event_type"), timestamp_micros(col("ts_us")).as("event_ts"))
    val qname = "swc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = DataPipelineQueries.windowCounts(events, "0 seconds")
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    (input, query, qname)
  }

  private val H = 3600000000L // 1 h in µs

  test("a window accumulates across micro-batches and emits once, on watermark passage") {
    val (input, query, qname) = harness()
    try {
      // two batches land in the same (a, [0,1h)) window
      input.addData(("a", 10L * 60 * 1000000), ("a", 20L * 60 * 1000000))
      query.processAllAvailable()
      input.addData(("a", 40L * 60 * 1000000))
      query.processAllAvailable()
      assert(spark.table(qname).isEmpty, "window emitted before its end passed the watermark")
      // far-future row closes everything
      input.addData(("z", 100L * H))
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(rows == Seq(("a", 0L, 3L)), s"cross-batch accumulation broken: $rows")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("types and hours count independently; watermark passage finalizes per window end") {
    val (input, query, qname) = harness()
    try {
      // batch max is 2.5 h -> watermark 2.5 h: (a, hour 0) and (b, hour 0)
      // finalize on the next trigger; (a, hour 2) stays open
      input.addData(("a", 1L), ("a", 30L * 60 * 1000000), ("b", 59L * 60 * 1000000),
        ("a", 2L * H + 30L * 60 * 1000000))
      query.processAllAvailable()
      input.addData(("b", 2L * H + 1L))
      query.processAllAvailable()
      val early = spark.table(qname).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(early == Seq(("a", 0L, 2L), ("b", 0L, 1L)), s"per-window finalization broken: $early")
      input.addData(("z", 100L * H))
      query.processAllAvailable()
      // the z closer's own window never emits: its end never passes the
      // watermark — the same reason the registered query needs a sentinel
      val all = spark.table(qname).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(all == Seq(("a", 0L, 2L), ("a", 2L * H, 1L), ("b", 0L, 1L), ("b", 2L * H, 1L)),
        s"final window set wrong: $all")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("stream_sketch_distinct: every window verdict true, exact legs match a batch recompute") {
    import graft.relational.Tables
    val sf = "/root/testdata/sf0.001"
    val rows = DataPipelineQueries.queries("stream_sketch_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "HLL estimate outside 5% + slack of exact")
    val exact = Tables.eventsTsUs(spark, sf)
      .groupBy((col("ts_us") - pmod(col("ts_us"), lit(3600000000L))).as("w"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length === exact.size, "one row per non-empty hour window")
    rows.foreach { r =>
      val (n, nd) = exact(r.getLong(0))
      assert(r.getLong(1) === n && r.getLong(2) === nd, s"window ${r.getLong(0)}")
    }
  }
}
