package graft.relational

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

/** stream_decontaminate — the ingest-time benchmark screen (r14). The
  * gate hash-proves verdict parity with the batch pass; this spec pins
  * the STATELESS deployment contract: the streaming plan runs no
  * stateful operator (no state store, no watermark) — the whole screen
  * is a broadcast stream-static join per micro-batch. */
class StreamDecontaminateSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark

  test("the streaming screen is stateless: zero state operators across all progress") {
    val sops = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("stream_decontam_")) {
          batches.incrementAndGet()
          sops.addAndGet(Option(e.progress.stateOperators).map(_.length).getOrElse(0))
        }
    }
    spark.streams.addListener(l)
    try {
      val n = DataPipelineQueries.queries("stream_decontaminate")(
        spark, "/root/testdata/sf0.001").count()
      assert(n === 500L, "one verdict row per document")
      spark.streams.awaitAnyTermination(1) // no-op; listener events drain below
      org.apache.spark.sql.graft.ColumnBridge
        .waitListenerBusEmpty(spark.sparkContext, 30000L)
    } finally spark.streams.removeListener(l)
    assert(batches.get() >= 1, "the streaming query must have reported progress")
    assert(sops.get() === 0,
      s"ingest screen must be stateless; saw ${sops.get()} state operators")
  }
}
