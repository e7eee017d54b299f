package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the session_window sessionizer: an open
  * session must absorb events from LATER micro-batches (the cross-trigger
  * state merge that distinguishes it from per-batch grouping), finalize
  * only when the watermark passes its end, and split exactly at the
  * half-open gap boundary the oracle pins (new session at diff >= gap). */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def harness(delay: String = "0 seconds") = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDS().toDF("user_id", "ts_us")
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
    val qname = "ssess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamingSessionize.sessions(events, "10 seconds", delay)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    (input, query, qname)
  }

  private def us(s: Double): Long = (s * 1e6).toLong

  test("a session spanning two micro-batches merges in state and emits once") {
    val (input, query, qname) = harness()
    try {
      // batch 1 opens user 7's session; batch 2 extends it (gap 4 s < 10 s)
      input.addData((7L, us(100)), (7L, us(104)))
      query.processAllAvailable()
      input.addData((7L, us(108)))
      query.processAllAvailable()
      // nothing can finalize yet: watermark (108 s) hasn't passed the
      // session end (108 + 10 s window extension)
      assert(spark.table(qname).isEmpty, "session emitted before finalization")
      // a far-future row pushes the watermark past the session's end
      input.addData((99L, us(10000)))
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((7L, 3L, us(100), us(108))),
        s"cross-batch session broken: ${rows.toSeq}")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("exact-gap event MERGES (inclusive end); one microsecond past it splits") {
    val (input, query, qname) = harness()
    try {
      // 110 s is EXACTLY 10 s after 100 s -> merges (end boundary
      // inclusive — the batch pass's `> gap` rule, tie included);
      // 120.000001 s is gap + 1 µs after 110 s -> new session
      input.addData((3L, us(100)), (3L, us(110)), (3L, us(120.000001)))
      query.processAllAvailable()
      input.addData((99L, us(10000)))
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .filter(_.getLong(0) == 3L)
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(1))).sortBy(_._1)
      assert(rows.toSeq == Seq((us(100), us(110), 2L), (us(120.000001), us(120.000001), 1L)),
        s"boundary rule broken: ${rows.toSeq}")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("users session independently; the watermark finalizes per session end") {
    val (input, query, qname) = harness()
    try {
      // batch 1's max event time is 150 s -> watermark 150 s after the
      // batch: user 1's session (end 105 + 10 = 115 s) finalizes on the
      // next trigger, user 2's (end 160 s) is held open in state
      input.addData((1L, us(100)), (1L, us(105)), (2L, us(148)), (2L, us(150)))
      query.processAllAvailable()
      input.addData((2L, us(155)))
      query.processAllAvailable()
      val afterFirst = spark.table(qname).collect().map(_.getLong(0)).toSeq
      assert(afterFirst == Seq(1L), s"per-session finalization broken: $afterFirst")
      // ... and the 155 s row EXTENDED user 2's still-open session
      input.addData((99L, us(10000)))
      query.processAllAvailable()
      val rows = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, 2L, us(105)), (2L, 3L, us(155))),
        s"held session lost its late extension: ${rows.toSeq}")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }

  test("late data inside the budget merges — even BRIDGING two open sessions; beyond it drops") {
    // the watermark-repair path the batch oracle can't see: with a 30 s
    // lateness budget, an out-of-order event may arrive AFTER later events
    // and must still land in (and here, weld together) its session
    val (input, query, qname) = harness("30 seconds")
    try {
      // batch 1: two session ranges for user 5 (gap 18 s > 10 s): [100,110) [118,128)
      input.addData((5L, us(100)), (5L, us(118)))
      query.processAllAvailable()
      // batch 2: a 10 s-late event at 108 s (watermark is 118-30 = 88 s, so
      // admitted). 108 ≤ 100+10 merges left; 118 ≤ 108+10 merges right —
      // the session_window range-merge welds all three into ONE session
      input.addData((5L, us(108)))
      query.processAllAvailable()
      input.addData((99L, us(10000)))
      query.processAllAvailable()
      val rows = spark.table(qname).collect().filter(_.getLong(0) == 5L)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((3L, us(100), us(118))),
        s"late bridge event did not weld the sessions: ${rows.toSeq}")
      // an event 9800 s behind the 9970 s watermark is beyond the budget:
      // dropped, no new session may appear for user 5
      input.addData((5L, us(200)))
      query.processAllAvailable()
      input.addData((99L, us(20000)))
      query.processAllAvailable()
      val after = spark.table(qname).collect().filter(_.getLong(0) == 5L)
      assert(after.length == 1, s"beyond-budget event was not dropped: ${after.toSeq}")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }
}
