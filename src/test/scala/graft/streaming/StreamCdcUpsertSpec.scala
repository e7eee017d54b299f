package graft.streaming

import graft.TestSpark
import graft.relational.DataPipelineQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The foreachBatch-upsert contracts the single-batch gate can't see:
  * later batches update keys, untouched keys survive, in-batch ties fold
  * by (ts, id), and RE-RUNNING a batch id is idempotent (same version
  * dir, same content — the exactly-once contract). */
class StreamCdcUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(tmp: java.nio.file.Path,
                  batches: Seq[Seq[(Long, Long, Double, Long)]]): Unit = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double, Long)]
    val df = input.toDS().toDF("user_id", "event_id", "value", "ts_us")
    val qname = java.util.UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.queryName("cdc_" + qname)
      .foreachBatch(DataPipelineQueries.cdcUpsertBatch(tmp) _).start()
    try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("cross-batch upsert: updates win, untouched keys survive, ties fold by (ts,id)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_spec")
    run(tmp, Seq(
      // batch 0: u1 and u2 get values; u1 has an in-batch tie on ts
      Seq((1L, 10L, 1.0, 100L), (1L, 11L, 2.0, 100L), (2L, 20L, 5.0, 50L)),
      // batch 1: u1 updated, u2 untouched, u3 appears
      Seq((1L, 30L, 9.0, 200L), (3L, 40L, 7.0, 10L))))
    val dirs = DataPipelineQueries.cdcStateDirs(tmp)
    assert(dirs.map(_.getName) === Seq("state_v000000000", "state_v000000001"))
    val fin = spark.read.parquet(dirs.last.getPath).orderBy("user_id").collect()
    assert(fin.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(fin(0).getLong(2) === 30L && fin(0).getDouble(3) === 9.0)
    assert(fin(1).getLong(2) === 20L, "untouched key keeps its batch-0 row")
    // the batch-0 state pinned the (ts,id) tie to the higher event_id
    val v0 = spark.read.parquet(dirs.head.getPath)
      .filter(col("user_id") === 1L).head
    assert(v0.getLong(2) === 11L)
  }

  test("re-running a batch id is idempotent: same version dir, same content") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc_spec2")
    val b0 = Seq((1L, 100L, 1.5, 10L), (2L, 101L, 2.5, 20L))
      .toDF("user_id", "event_id", "value", "ts_us")
    DataPipelineQueries.cdcUpsertBatch(tmp)(b0, 0L)
    val b1 = Seq((1L, 200L, 9.5, 30L)).toDF("user_id", "event_id", "value", "ts_us")
    DataPipelineQueries.cdcUpsertBatch(tmp)(b1, 1L)
    val after = spark.read.parquet(DataPipelineQueries.cdcStateDirs(tmp).last.getPath)
      .orderBy("user_id").collect().map(_.toString).toSeq
    // a failure replay of batch 1 arrives again — same id, same input
    DataPipelineQueries.cdcUpsertBatch(tmp)(b1, 1L)
    val dirs = DataPipelineQueries.cdcStateDirs(tmp)
    assert(dirs.size === 2, "a replay must not create a new version")
    val replay = spark.read.parquet(dirs.last.getPath)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(replay === after, "replayed publish is byte-for-byte the same view")
  }
}
