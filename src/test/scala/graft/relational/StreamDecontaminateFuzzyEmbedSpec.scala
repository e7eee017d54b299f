package graft.relational

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

/** stream_decontaminate_fuzzy + stream_embed_decontaminate (r14 verdict
  * asks #5/#6) — the MinHash-containment and cosine-vs-benchmark screens
  * deployed at ingest time. The gate hash-proves verdict parity with the
  * batch passes (their oracles are shared verbatim); these specs pin the
  * STATELESS deployment contract for both: zero state operators across
  * every micro-batch (the fuzzy screen is a broadcast stream-static band
  * join; the embed screen folds the fixed benchmark side into one native
  * per-row argmax kernel — a streaming groupBy would be stateful). */
class StreamDecontaminateFuzzyEmbedSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def statelessRun(queryName: String, sinkPrefix: String,
                           expectRows: Long): Unit = {
    val sops = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name != null && e.progress.name.startsWith(sinkPrefix)) {
          batches.incrementAndGet()
          sops.addAndGet(Option(e.progress.stateOperators).map(_.length).getOrElse(0))
        }
    }
    spark.streams.addListener(l)
    try {
      val n = DataPipelineQueries.queries(queryName)(spark, sf).count()
      assert(n === expectRows, s"$queryName row count")
      org.apache.spark.sql.graft.ColumnBridge
        .waitListenerBusEmpty(spark.sparkContext, 30000L)
    } finally spark.streams.removeListener(l)
    assert(batches.get() >= 1, s"$queryName must have reported progress")
    assert(sops.get() === 0,
      s"$queryName must be stateless; saw ${sops.get()} state operators")
  }

  test("fuzzy ingest screen is stateless and covers every corpus doc") {
    // 500 docs at sf0.001, 10% benchmark -> 450 corpus verdict rows
    statelessRun("stream_decontaminate_fuzzy", "stream_decontam_fuzzy_", 450L)
  }

  test("embedding ingest screen is stateless and covers every corpus vector") {
    val nCorp = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 =!= 0).count()
    statelessRun("stream_embed_decontaminate", "stream_embed_decontam_", nCorp)
  }

  test("streamed verdicts are row-identical to the batch passes") {
    val sfuzz = DataPipelineQueries.queries("stream_decontaminate_fuzzy")(spark, sf)
    val bfuzz = DataPipelineQueries.queries("text_decontaminate_fuzzy")(spark, sf)
    assert(sfuzz.except(bfuzz).count() === 0L)
    assert(bfuzz.except(sfuzz).count() === 0L)
    val semb = DataPipelineQueries.queries("stream_embed_decontaminate")(spark, sf)
    val bemb = DataPipelineQueries.queries("dedup_embedding_decontaminate")(spark, sf)
    assert(semb.except(bemb).count() === 0L)
    assert(bemb.except(semb).count() === 0L)
  }
}
