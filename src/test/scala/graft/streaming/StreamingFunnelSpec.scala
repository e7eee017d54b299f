package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the funnel state machine: stage progress
  * must carry ACROSS micro-batches (the gate's single-batch replay can't
  * see this), a completed funnel must emit exactly once, stage order must
  * be enforced (a purchase before any click never completes), and users
  * must stay independent. */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"

  private def harness() = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDS().toDF("user_id", "event_id", "ts_us", "event_type")
    val qname = "sfun_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamingFunnel.completions(events)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    (input, query, qname)
  }

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProvKey)
    spark.conf.set(ProvKey, StreamingNearDup.RocksDbProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProvKey, v)
      case None => spark.conf.unset(ProvKey)
    }
  }

  test("stage progress carries across micro-batches; completion emits once") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        // batch 1: view only — nothing emits
        input.addData((1L, 1L, 1000L, "view"))
        query.processAllAvailable()
        assert(spark.table(qname).count() === 0)
        // batch 2: click then purchase — completion emits against batch 1's view
        input.addData((1L, 2L, 2000L, "click"), (1L, 3L, 3000L, "purchase"))
        query.processAllAvailable()
        // batch 3: a second purchase must NOT re-emit
        input.addData((1L, 4L, 4000L, "purchase"))
        query.processAllAvailable()
        val rows = spark.table(qname).collect()
        assert(rows.length === 1)
        val r = rows.head
        assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
          === ((1L, 1000L, 2000L, 3000L)))
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }

  test("stage order enforced: purchase/click before any view never completes") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        // clicks and purchases with no prior view (ts before the view)
        input.addData((2L, 1L, 1000L, "purchase"), (2L, 2L, 2000L, "click"))
        query.processAllAvailable()
        input.addData((2L, 3L, 3000L, "view"), (2L, 4L, 4000L, "purchase"))
        query.processAllAvailable()
        // view arrived, then purchase — but no click AFTER the view: no funnel
        assert(spark.table(qname).count() === 0)
        // a click then purchase completes it
        input.addData((2L, 5L, 5000L, "click"), (2L, 6L, 6000L, "purchase"))
        query.processAllAvailable()
        val rows = spark.table(qname).collect()
        assert(rows.length === 1)
        assert(rows.head.getLong(1) === 3000L, "view is the user's first view")
        assert(rows.head.getLong(2) === 5000L)
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }

  test("funnel progress survives a checkpoint restart (stop, recover, complete)") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Long, Long, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft_funnel_out").toString
      def start() = StreamingFunnel.completions(
        input.toDS().toDF("user_id", "event_id", "ts_us", "event_type"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      try {
        input.addData((9L, 1L, 1000L, "view"), (9L, 2L, 2000L, "click"))
        q1.processAllAvailable()
      } finally q1.stop()
      // restart: the view+click progress must come back from the state
      // store, so the purchase alone completes the funnel
      val q2 = start()
      try {
        input.addData((9L, 3L, 3000L, "purchase"))
        q2.processAllAvailable()
      } finally q2.stop()
      val rows = spark.read.parquet(outDir).collect()
      assert(rows.length === 1)
      assert((rows.head.getLong(0), rows.head.getLong(1),
        rows.head.getLong(2), rows.head.getLong(3)) === ((9L, 1000L, 2000L, 3000L)))
    }
  }

  test("users are independent; within-batch fold follows event time, not arrival order") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        // user 3's events delivered out of order in ONE batch: the sorted
        // fold must still find view@1000 -> click@2000 -> purchase@3000
        input.addData((3L, 13L, 3000L, "purchase"), (3L, 11L, 1000L, "view"),
          (3L, 12L, 2000L, "click"),
          // user 4 never converts
          (4L, 21L, 1000L, "view"), (4L, 22L, 2000L, "view"))
        query.processAllAvailable()
        val rows = spark.table(qname).collect()
        assert(rows.length === 1)
        assert(rows.head.getLong(0) === 3L)
        assert(rows.head.getLong(3) === 3000L)
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }
}
