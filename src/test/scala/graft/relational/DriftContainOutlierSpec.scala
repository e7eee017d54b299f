package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: asymmetric containment detection, embedding
  * outlier z-scores, snapshot drift audit — each checked against a
  * planted case or an independent recompute (the oracle pins the
  * cross-engine hash; these pin the SEMANTICS). */
class DriftContainOutlierSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("text_containment: a planted verbatim quote scores containment 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    val quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val container = s"prefix words here $quote and a long suffix tail of extra tokens"
    val docs = Seq(
      (0L, quote, "en", "s0", quote.length.toLong),
      (1L, container, "en", "s0", container.length.toLong),
      // unrelated filler so document frequencies are non-degenerate
      (2L, "kilo lima mike november oscar papa quebec romeo sierra tango", "en", "s0", 60L),
      (3L, "uniform victor whiskey xray yankee zulu one two three four", "en", "s0", 58L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DataPipelineQueries.queries("text_containment")(spark, dir).collect()
    val hit = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(hit.isDefined, "the quoted doc must surface against its container")
    assert(hit.get.getDouble(5) === 1.0, "every shingle of the quote is in the container")
    // asymmetry: the container is NOT contained in the quote at 1.0
    rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 0L)
      .foreach(r => assert(r.getDouble(5) < 1.0))
  }

  test("text_containment on the fixture: ranked, bounded, shared <= own shingles") {
    val rows = DataPipelineQueries.queries("text_containment")(spark, sf).collect()
    assert(rows.length === 20, "top-20 contract")
    val cs = rows.map(_.getDouble(5))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "ranked by containment desc")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), "shared cannot exceed own shingle count")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("embed_outliers: flag consistent with z, z recomputed from returned distances") {
    val rows = EmbedQueries.queries("embed_outliers")(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach(r => assert(r.getBoolean(4) === (r.getDouble(3) > 2.0),
      s"flag must equal z>2: $r"))
    // independent recompute of z from the returned (label, d2_r) columns
    val byLabel = rows.groupBy(_.getLong(1))
    byLabel.foreach { case (_, rs) =>
      val m = rs.map(x => math.round(x.getDouble(2) * 1e6).toDouble)
      val mu = m.sum / m.length
      val sd = math.sqrt(math.max(m.map(x => x * x).sum / m.length - mu * mu, 0.0))
      rs.foreach { r =>
        val z = if (sd > 0)
          BigDecimal((math.round(r.getDouble(2) * 1e6) - mu) / sd)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
        assert(math.abs(r.getDouble(3) - z) < 1e-6, s"z mismatch for $r")
      }
      // a z-score column is centered by construction
      val zbar = rs.map(_.getDouble(3)).sum / rs.length
      assert(math.abs(zbar) < 0.01)
    }
  }

  test("dq_schema_drift: deltas equal a direct recompute over the parity halves") {
    val row = QualityQueries.queries("dq_schema_drift")(spark, sf).collect().head
    val e = Tables.eventsTsUs(spark, sf)
    def half(p: Int) = e.filter(col("event_id") % 2 === p)
    val na = half(0).count(); val nb = half(1).count()
    assert(row.getLong(0) === na && row.getLong(1) === nb)
    val nullA = half(0).filter(col("value").isNull).count().toDouble / na
    val nullB = half(1).filter(col("value").isNull).count().toDouble / nb
    assert(math.abs(row.getDouble(2) - (nullA - nullB)) < 1e-5)
    assert(row.getBoolean(4), "parity halves share the event-type domain")
    assert(row.getBoolean(5), "parity halves overlap in time")
    assert(row.getBoolean(7), "parity halves cannot drift the mean beyond tolerance")
  }
}
