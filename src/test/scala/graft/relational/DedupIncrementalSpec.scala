package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** Incremental-ingest dedup semantics: arrivals are checked against
  * HISTORY's normalized hashes only — normalization-equivalent text is a
  * dup, fresh text is not, and arrivals never flag each other. */
class DedupIncrementalSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("history match via normalization, fresh arrival clean, no within-batch flagging") {
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    Seq(
      (0L, "Hello   World"),  // history
      (2L, "unique history"), // history
      (1L, "  hello world "), // arrival: normalization-equivalent to doc 0 -> dup
      (3L, "brand new text"), // arrival: fresh -> not a dup
      (5L, "brand new text")  // arrival: equals ARRIVAL 3 only -> still not a dup of history
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("dedup_incremental")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(rows == Seq((1L, true), (3L, false), (5L, false)),
      s"incremental dedup semantics broken: $rows")
  }
}
