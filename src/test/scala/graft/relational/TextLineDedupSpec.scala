package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** C4-style cross-corpus line dedup: first occurrence (doc order, then
  * position) wins globally; rebuilt docs preserve surviving-span order;
  * within-doc repeats also collapse; a fully-seen doc becomes empty. */
class TextLineDedupSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  test("first occurrence wins across and within docs; fully-duplicated doc empties") {
    val dir = java.nio.file.Files.createTempDirectory("linededup").toString
    Seq(
      (0L, "alpha. beta. alpha"),   // 'alpha' kept at pos 0; 'alpha' (pos 2) dropped
      (1L, "beta. gamma"),          // 'beta' seen in doc 0 -> only 'gamma' survives
      (2L, "alpha. beta")           // everything seen -> empty
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("text_line_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(
      (0L, "alpha. beta", 3L, 2L),
      (1L, "gamma", 2L, 1L),
      (2L, "", 2L, 0L)), s"line-dedup rule broken: $rows")
  }
}
