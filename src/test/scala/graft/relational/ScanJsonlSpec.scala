package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The JSONL gate query reads data it wrote itself, so it never meets a
  * malformed line — real corpora do. This spec pins the read path's
  * bad-record policy under an explicit schema: PERMISSIVE (the default)
  * quarantines the line into a corrupt-record column instead of killing
  * the 100-TB job, and FAILFAST aborts loudly when ingest must be strict.
  */
class ScanJsonlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("_bad", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonlspec")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("PERMISSIVE quarantines malformed lines into the corrupt-record column") {
    val dir = writeLines(Seq(
      """{"doc_id": 0, "text": "fine"}""",
      """{"doc_id": 1, "text": "also fine"}""",
      """{"doc_id": 2, "text": "truncated""", // malformed: unterminated string
      """not json at all"""))
    // Spark refuses to answer queries that touch ONLY the corrupt-record
    // column of a raw scan — materialize the parse once, then slice
    val rows = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir)
      .localCheckpoint(true)
    val good = rows.filter(col("_bad").isNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(good.toSeq == Seq((0L, "fine"), (1L, "also fine")))
    // every malformed line survives, quarantined with its raw content —
    // the count a production ingest alerts on
    val bad = rows.filter(col("_bad").isNotNull).select(col("_bad"))
      .collect().map(_.getString(0))
    assert(bad.length == 2, s"expected 2 quarantined lines, got ${bad.toSeq}")
    assert(bad.exists(_.contains("not json at all")), bad.toSeq.toString)
  }

  test("FAILFAST aborts the scan on the first malformed line") {
    val dir = writeLines(Seq(
      """{"doc_id": 0, "text": "fine"}""",
      """broken"""))
    val ex = intercept[Throwable] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("malformed") || msgs.contains("FAILFAST"), msgs)
  }

  test("the registered scan_jsonl query round-trips a tiny corpus exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonlq").toString
    val data = Seq(
      (0L, "a \"quoted\" text\nwith a newline", "en", "web", 30L),
      (1L, "unicode: café 中文", "de", "book", 17L),
      (2L, "", "fr", "web", 0L))
    data.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DataPipelineQueries.queries("scan_jsonl")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getString(1), r.getString(2), r.getLong(3)))
    val want = data.map { case (id, t, l, s, n) => (id, t, l, s, n) }
    assert(got.toSeq == want, s"round-trip diverged: ${got.toSeq}")
  }
}
