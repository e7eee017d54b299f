package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the Welford anomaly scorer: the O(1)
  * state must carry a user's baseline ACROSS micro-batches (the gate's
  * single-batch replay can't see this), fold out-of-order arrivals within
  * a batch in event-time order, keep users independent, and gate the z
  * verdict exactly as the batch oracle does.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"

  private def harness() = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val events = input.toDS().toDF("user_id", "event_id", "ts_us", "value")
    val qname = "sanom_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = StreamingAnomaly.scored(events)
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

  test("baseline state carries across micro-batches; O(1) state, not history") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        // batch 1: six calm events establish the baseline (values 10±1)
        input.addData((1L, 1L, 1000L, 10.0), (1L, 2L, 2000L, 11.0),
          (1L, 3L, 3000L, 9.0), (1L, 4L, 4000L, 10.0),
          (1L, 5L, 5000L, 11.0), (1L, 6L, 6000L, 9.0))
        query.processAllAvailable()
        // batch 2: a spike must be judged against batch 1's state
        input.addData((1L, 7L, 7000L, 100.0))
        query.processAllAvailable()
        val rows = spark.table(qname).collect().sortBy(_.getLong(0))
        assert(rows.length === 7)
        val spike = rows.last
        assert(spike.getLong(4) === 6L, "spike judged against all six prior events")
        assert(spike.getBoolean(8), "a 100 on a 10-mean baseline must flag")
        // the first five arrivals are under the n>=5 gate (z null)
        rows.take(5).foreach(r => assert(r.isNullAt(7), s"event ${r.getLong(0)} gated"))
        // event 6 has n_base=5: z emitted but calm -> no flag
        assert(!rows(5).isNullAt(7) && !rows(5).getBoolean(8))
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }

  test("within-batch arrivals fold in (ts_us, event_id) order, not arrival order") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        // delivered out of order: the ts=1000 row must become the FIRST
        // baseline point (n_base 0), the ts=9000 row the last (n_base 2)
        input.addData((5L, 31L, 9000L, 30.0), (5L, 30L, 1000L, 10.0),
          (5L, 32L, 5000L, 20.0))
        query.processAllAvailable()
        val rows = spark.table(qname).collect().sortBy(_.getLong(2))
        assert(rows.map(_.getLong(4)).toSeq === Seq(0L, 1L, 2L),
          "n_base must follow event time")
        // the ts=5000 row's baseline is exactly {10.0}
        assert(rows(1).getDouble(5) === 10.0)
        // the ts=9000 row's baseline mean is (10+20)/2
        assert(rows(2).getDouble(5) === 15.0)
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }

  test("users are scored against their own baselines only") {
    withRocksDb {
      val (input, query, qname) = harness()
      try {
        input.addData((1L, 1L, 1000L, 5.0), (2L, 2L, 1000L, 500.0),
          (1L, 3L, 2000L, 6.0), (2L, 4L, 2000L, 510.0))
        query.processAllAvailable()
        val rows = spark.table(qname).collect()
        val u1second = rows.find(_.getLong(0) == 3L).get
        val u2second = rows.find(_.getLong(0) == 4L).get
        assert(u1second.getDouble(5) === 5.0, "user 1 baseline unpolluted by user 2")
        assert(u2second.getDouble(5) === 500.0, "user 2 baseline unpolluted by user 1")
      } finally { query.stop(); spark.catalog.dropTempView(qname) }
    }
  }
}
