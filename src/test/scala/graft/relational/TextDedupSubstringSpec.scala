package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** text_dedup_substring: maximal-span semantics on a constructed corpus
  * where the answer is known by hand, plus structural invariants on the
  * fixture — the things the value hash can't explain if they break. */
class TextDedupSubstringSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("fixture spans are well-formed: >= gram tokens, consistent gram counts, maximal") {
    val rows = AnalyticsQueries.queries("text_dedup_substring")(spark, sf).collect()
    assert(rows.nonEmpty, "the synthetic corpus contains cross-doc verbatim passages")
    rows.foreach { r =>
      val (start, end, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(end - start >= 10, "a span covers at least one full gram")
      assert(n === end - start - 9, "n_grams must equal span length - gram + 1")
    }
    // maximality: spans of one doc never touch or overlap (they'd have merged)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(1) > a.getLong(2) - 9,
          "adjacent duplicated positions must have merged into one span")
        case _ =>
      }
    }
  }

  test("a planted 12-token shared passage yields one maximal 3-gram span in both docs") {
    val dir = java.nio.file.Files.createTempDirectory("subdup").toString
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens => positions 0..2 dup
    val docs = Seq(
      (0L, s"alpha beta gamma $shared delta epsilon zeta eta theta iota"),
      (1L, s"$shared completely different tail words here now ok fine yes"),
      (2L, "no duplicated passage in this document at all just unique words everywhere right"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = AnalyticsQueries.queries("text_dedup_substring")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: shared starts at token 3 -> dup gram positions 3,4,5 -> span [3,15)
    // doc 1: shared starts at token 0 -> span [0,12)
    assert(rows.toSet === Set((0L, 3L, 15L, 3L), (1L, 0L, 12L, 3L)),
      s"got ${rows.mkString(",")}")
  }
}
