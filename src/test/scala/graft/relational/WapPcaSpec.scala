package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-B specs: the integer power-method PC1 projection (independent
  * driver recompute — a second implementation, not a replay of the same
  * plan) and the write-audit-publish manifest-read semantics (debris
  * blindness, which the DuckDB hash checks only indirectly). */
class WapPcaSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("embed_pca: matches an independent driver-side integer recompute") {
    val rows = EmbedQueries.queries("embed_pca")(spark, sf).collect()
    assert(rows.length > 0)
    // independent recompute: plain-Scala covariance (two-pass textbook
    // formula — different accumulation than CovMatrix's one-pass identity,
    // agreeing only through the 6-dp rounding), then the same integer steps
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val d = embs.head._2.length
    val n = embs.length
    val mean = Array.tabulate(d)(j => embs.map(_._2(j)).sum / n)
    val covi = Array.ofDim[Long](d, d)
    for (i <- 0 until d; j <- 0 until d) {
      val c = embs.map { case (_, v) => (v(i) - mean(i)) * (v(j) - mean(j)) }.sum / (n - 1)
      covi(i)(j) = math.round(BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    }
    var v = Array.fill(d)(100000L)
    for (_ <- 0 until 8) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => covi(i)(j) * v(j)).sum)
      val m = u.map(math.abs).max
      v = u.map(x => x * 100000L / m)
    }
    assert(v.forall(x => math.abs(x) <= 100000L), "L-inf normalization bounds components")
    val expected = embs.map { case (id, e) =>
      id -> (0 until d).map(j => math.round(e(j) * 1e6) * v(j)).sum
    }.toMap
    rows.foreach { r =>
      assert(r.getLong(2) === expected(r.getLong(0)),
        s"pc1 mismatch for vec ${r.getLong(0)}")
    }
    // the projection genuinely separates: not all values identical
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  test("write-audit-publish: manifest readers are blind to staging debris") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wap_spec")
    val stage = tmp.resolve("s").toFile
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x")
      .repartition(2).write.parquet(stage.getPath)
    val committed = stage.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath)
    // plant an orphan duplicate part-file AFTER the "commit"
    java.nio.file.Files.copy(new java.io.File(committed.head).toPath,
      stage.toPath.resolve("part-99999-orphan.parquet"))
    // directory reader over-counts; manifest reader does not
    assert(spark.read.parquet(stage.getPath).count() > 3)
    assert(spark.read.parquet(committed: _*).count() === 3)
  }

  test("sink_write_audit_publish: audit passes and per-lang counts equal the source") {
    val rows = QualityQueries.queries("sink_write_audit_publish")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), "PK audit must pass on the fixture"))
    val src = Tables.tbl(spark, sf, "documents").filter(col("n_chars") > 0)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === src(r.getString(0))))
  }
}
