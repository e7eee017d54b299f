package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Holt linear smoothing + audio DFT (the round-8 series additions).
  * Oracle parity runs at the gate; these pin the recurrence itself
  * against an independent driver fold, the forecast extrapolation
  * algebra, and the DFT against a direct driver recompute.
  */
class SeriesBatch5Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SeriesQueries.queries(name)(spark, sf)

  private def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------ Holt
  test("ts_holt_forecast matches an independent driver fold of the recurrence") {
    val rows = q("ts_holt_forecast").collect()
    assert(rows.nonEmpty)
    // recompute the hourly series exactly as the query does
    val hourly = Tables.eventsTsUs(spark, sf).filter(col("value").isNotNull)
      .withColumn("bucket", expr("ts_us div 3600000000"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(expr("cast(round(value * 1e6) as long)")).as("m"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r6(r.getLong(2).toDouble / 1e6 / r.getLong(3).toDouble)))
    hourly.groupBy(_._1).foreach { case (tpe, series) =>
      val ys = series.sortBy(_._2)
      var l = ys(0)._3
      var b = if (ys.length >= 2) ys(1)._3 - ys(0)._3 else 0.0
      val fit = rows.filter(r => r.getString(0) == tpe && !r.getBoolean(2)).sortBy(_.getLong(1))
      assert(fit.length === ys.length, s"$tpe: one fit row per bucket")
      assert(fit.head.isNullAt(4), s"$tpe: first row has no one-step prediction")
      assert(fit.head.getDouble(5) === r6(l))
      var t = 1
      while (t < ys.length) {
        val pred = l + b
        val lN = 0.5 * ys(t)._3 + 0.5 * pred
        val bN = 0.3 * (lN - l) + 0.7 * b
        assert(fit(t).getDouble(4) === r6(pred), s"$tpe t=$t: yhat")
        assert(fit(t).getDouble(5) === r6(lN), s"$tpe t=$t: level")
        assert(fit(t).getDouble(6) === r6(bN), s"$tpe t=$t: trend")
        l = lN; b = bN; t += 1
      }
      // forecasts: 3 rows, linear extrapolation from the final state
      val fc = rows.filter(r => r.getString(0) == tpe && r.getBoolean(2)).sortBy(_.getLong(1))
      assert(fc.length === 3)
      fc.zipWithIndex.foreach { case (r, i) =>
        val h = i + 1
        assert(r.getLong(1) === ys.last._2 + h, s"$tpe: forecast bucket h=$h")
        assert(r.isNullAt(3), "forecast rows carry no observation")
        assert(r.getDouble(4) === r6(l + h.toDouble * b), s"$tpe: forecast value h=$h")
      }
    }
  }

  // --------------------------------------------------------- audio DFT
  test("multimodal_audio_fft matches a direct driver DFT; one peak per doc") {
    val rows = q("multimodal_audio_fft").collect()
    assert(rows.nonEmpty)
    val texts = Tables.tbl(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length === 16, s"doc $doc: 16 bins")
      assert(rs.count(_.getBoolean(3)) === 1, s"doc $doc: exactly one peak")
      val peak = rs.find(_.getBoolean(3)).get
      assert(rs.forall(r => peak.getDouble(2) >= r.getDouble(2)), s"doc $doc: peak is max")
      // docs below one frame are absent; present docs have >= 320 bytes
      assert(texts(doc).length >= 320)
    }
    // direct DFT recompute for one document
    val doc = byDoc.keys.min
    val bytes = texts(doc).getBytes("ISO-8859-1")
    val x = Array.tabulate(160)(i => ((bytes(2 * i) & 0xff) + 256 * (bytes(2 * i + 1) & 0xff)))
      .map(v => if (v >= 32768) v - 65536 else v)
    (1 to 16).foreach { bin =>
      val re = x.zipWithIndex.map { case (v, i) =>
        v * math.cos(2.0 * math.Pi * bin * i / 160.0) }.sum
      val im = x.zipWithIndex.map { case (v, i) =>
        v * math.sin(2.0 * math.Pi * bin * i / 160.0) }.sum
      val got = byDoc(doc).find(_.getLong(1) == bin.toLong).get.getDouble(2)
      assert(math.abs(got - r2(math.sqrt(re * re + im * im))) <= 0.011,
        s"doc $doc bin $bin: |${got}| vs driver DFT")
    }
  }
}
