package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** text_decontaminate_fuzzy: planted-leak fixture (verbatim copy,
  * paraphrase-level superset, unrelated doc) plus real-fixture
  * invariants the value-hash oracle can't explain if they break. */
class DecontaminateFuzzySpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("verbatim and superset leaks are flagged with the right source; unrelated docs are clean") {
    val dir = java.nio.file.Files.createTempDirectory("decontamfuzzy").toString
    val bench = "the quick brown fox jumps over the lazy dog near the river bank at dawn " +
      "while seven wizards quietly brew potent elixirs behind the old stone mill"
    val unrelated = "completely different subject matter entirely: quarterly financial " +
      "projections indicate sustained growth across all maritime shipping segments"
    Seq(
      (0L, bench),                                     // benchmark (doc_id % 10 = 0)
      (1L, bench),                                     // verbatim leak -> containment 1.0
      (2L, bench + " plus an appended commentary paragraph that the eval never had"),
      (3L, unrelated),                                 // clean
      (10L, unrelated + " second benchmark entry to make the bench side plural")
    ).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("text_decontaminate_fuzzy")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), "one row per non-benchmark doc")
    // verbatim copy: containment exactly 1.0, attributed to doc 0
    assert(rows(1L).getBoolean(5) && rows(1L).getLong(2) == 0L
      && rows(1L).getDouble(3) == 1.0, s"verbatim leak: ${rows(1L)}")
    // superset: every benchmark shingle present -> containment 1.0, but
    // jaccard strictly below it (the asymmetric metric's whole point)
    assert(rows(2L).getBoolean(5) && rows(2L).getLong(2) == 0L
      && rows(2L).getDouble(3) == 1.0
      && rows(2L).getDouble(4) < rows(2L).getDouble(3), s"superset leak: ${rows(2L)}")
    // unrelated doc: clean. (It shares no shingles with bench doc 0; bench
    // doc 10 CONTAINS it, but containment normalizes by the benchmark
    // side, so C = |S(10) ∩ S(3)| / |S(10)| < 1 yet may exceed 0.5 — that
    // is a TRUE leak of doc 10's content and must be flagged against 10.)
    val r3 = rows(3L)
    if (r3.getBoolean(5)) assert(r3.getLong(2) == 10L, s"doc 3 source: $r3")
  }

  test("real fixture: flags are consistent, metrics bounded, exact dups contained at 1.0") {
    val rows = graft.SparkEntry.queries("text_decontaminate_fuzzy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val contaminated = r.getBoolean(5)
      assert(contaminated == !r.isNullAt(2), s"flag/attribution mismatch: $r")
      if (contaminated) {
        val c = r.getDouble(3); val j = r.getDouble(4)
        assert(c >= 0.5 && c <= 1.0, s"containment out of range: $r")
        assert(j > 0.0 && j <= c + 1e-9, s"jaccard must not exceed containment: $r")
        assert(r.getLong(1) > 0, s"contaminated doc must have had candidates: $r")
      }
    }
  }
}
