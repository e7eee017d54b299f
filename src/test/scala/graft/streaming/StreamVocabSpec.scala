package graft.streaming

import graft.TestSpark
import graft.text.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Complete-mode streaming aggregation: counts must ACCUMULATE across
  * micro-batches in the state store (not reset per trigger), and the sink
  * must hold the full updated table after each trigger. */
class StreamVocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("token counts accumulate across triggers; the sink is the full table") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val qname = "svocab_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // the REGISTERED aggregation builder, not a copy — edits to the gate
    // query's plan are pinned here automatically
    val query = graft.relational.DataPipelineQueries.vocabCounts(input.toDS().toDF("text"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    def table(): Map[String, Long] =
      spark.table(qname).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      input.addData("alpha beta alpha")
      query.processAllAvailable()
      assert(table() == Map("alpha" -> 2L, "beta" -> 1L))
      // trigger 2 must ADD to trigger 1's state, and the sink must show
      // the union of both triggers' tokens
      input.addData("beta gamma")
      query.processAllAvailable()
      assert(table() == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L),
        s"state reset between triggers: ${table()}")
    } finally { query.stop(); spark.catalog.dropTempView(qname) }
  }
}
