package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

/** stream_quality_filter — the persisted quality model deployed at ingest
  * time. Pins the stateless contract (zero state operators: features fold
  * into one per-row projection, scoring is a native kernel) and the
  * bit-parity certificate the grid carries (streamed probability ==
  * batch recompute from the persisted feature table, for EVERY doc). */
class StreamQualityFilterSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ingest-time quality scoring is stateless and bit-matches the batch path") {
    val sops = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith("stream_quality_")) {
          batches.incrementAndGet()
          sops.addAndGet(Option(e.progress.stateOperators).map(_.length).getOrElse(0))
        }
    }
    spark.streams.addListener(l)
    val rows =
      try {
        val r = DataPipelineQueries.queries("stream_quality_filter")(spark, sf).collect()
        org.apache.spark.sql.graft.ColumnBridge
          .waitListenerBusEmpty(spark.sparkContext, 30000L)
        r
      } finally spark.streams.removeListener(l)
    assert(batches.get() >= 1, "the streaming query must have reported progress")
    assert(sops.get() === 0,
      s"ingest quality filter must be stateless; saw ${sops.get()} state operators")
    // one verdict row per token-bearing doc, every certificate true
    val universe = Tables.tbl(spark, sf, "documents")
      .filter(size(graft.text.TextOps.tokens("text")) > 0).count()
    assert(rows.length.toLong === universe)
    rows.foreach { r =>
      assert(r.getBoolean(1), s"scored_in_stream for doc ${r.getLong(0)}")
      assert(r.getBoolean(2), s"matches_batch (bit parity) for doc ${r.getLong(0)}")
    }
  }
}
