package graft.relational

import graft.TestSpark
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_minhash_incremental's production contract (r12 verdict ask #5):
  * the arrival batch probes the PERSISTED history signature table — the
  * history side is built once per corpus (memo), and the probe plan's only
  * parquet reads are that table (history text is never re-shingled; corpus
  * text reaches the plan solely through the cached arrival batch). Plus
  * the value surface: exact copy → jaccard 1.0, near-dup ≥ 0.5, unrelated
  * arrival → no partner. */
class IncrementalMinhashPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "the cat watches from the warm windowsill and the birds sing"

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("mhinc").toString
    Seq(
      (0L, base), // history
      (2L, "some other historical content entirely about columnar " +
        "shuffles and broadcast joins across executors"),
      (4L, "third history row with its own words about adaptive " +
        "execution planning and partition pruning"),
      (1L, base), // arrival: exact copy of history doc 0
      (3L, base.replace("warm", "cold")), // arrival: near-dup of doc 0
      (5L, "totally unrelated arrival text concerning gardens birds " +
        "morning dew and quiet unhurried walks"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("arrivals find their history partners; unrelated arrivals none") {
    val dir = writeFixture()
    val rows = DataPipelineQueries.queries("dedup_minhash_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(rows.keySet == Set(1L, 3L, 5L), s"arrival set: ${rows.keySet}")
    assert(rows(1L)._2 == 0L && rows(1L)._3 == 1.0, s"exact copy: ${rows(1L)}")
    assert(rows(3L)._2 == 0L && rows(3L)._3 >= 0.5 && rows(3L)._3 < 1.0,
      s"near-dup: ${rows(3L)}")
    assert(rows(5L)._2 == -1L && rows(5L)._1 == 0L, s"unrelated: ${rows(5L)}")
  }

  test("family signature table builds once per corpus (shared minhash_sigs memo)") {
    val dir = writeFixture()
    def builds = graft.core.SessionMemo.buildLedger
      .count(_._1 == "minhash_sigs")
    val before = builds
    DataPipelineQueries.minhashHistoryTable(spark, dir).count()
    val afterFirst = builds
    DataPipelineQueries.minhashHistoryTable(spark, dir).count()
    assert(afterFirst == before + 1, "first call must record one build")
    assert(builds == afterFirst, "second call must serve from the memo")
    // the whole family serves from that ONE build: running
    // dedup_minhash_incremental AND text_decontaminate_fuzzy over the
    // same corpus must not record another minhash_sigs build
    DataPipelineQueries.queries("dedup_minhash_incremental")(spark, dir).count()
    DataPipelineQueries.queries("text_decontaminate_fuzzy")(spark, dir).count()
    assert(builds == afterFirst, "family queries must share the memoized build")
  }

  test("probe plan reads only the signature table — history never rescanned") {
    val dir = writeFixture()
    val (frame, arr) = DataPipelineQueries.minhashIncrementalParts(spark, dir)
    try {
      val scans = frame.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation
      }.collect { case h: HadoopFsRelation =>
        h.location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.nonEmpty, "expected parquet reads of the signature table")
      assert(scans.forall(_.contains("graft_minhash_sigs_")),
        s"non-signature-table parquet scan in the probe plan: $scans")
      // corpus text reaches the plan ONLY through the cached arrival batch
      val cached = frame.queryExecution.optimizedPlan.collect {
        case m: InMemoryRelation => m
      }
      assert(cached.nonEmpty, "arrival batch must be cached, not rescanned")
    } finally arr.unpersist()
  }
}
