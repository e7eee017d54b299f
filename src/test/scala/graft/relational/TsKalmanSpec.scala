package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** ts_kalman against an independent driver fold (BigInt arithmetic, so a
  * Long-overflow bug in the engine path could not hide in a matching
  * recompute), plus the behaviors the filter must show: a planted spike
  * trips the 3σ innovation gate while the quiet stretch stays quiet, the
  * variance converges to a steady state, and the gain starts diffuse. */
class TsKalmanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (event_type, hour, value) rows → events.parquet, one event per hour
    * so the hourly mean equals the planted value exactly. */
  private def run(rows: Seq[(String, Long, Double)]): Array[(String, Long, Long, Long, Long, Long, Boolean)] = {
    val dir = java.nio.file.Files.createTempDirectory("kalman").toString
    rows.zipWithIndex.map { case ((tpe, h, v), i) =>
      // a LONG ts column is the NANOS fixture encoding (Tables.tsUsCol)
      (i.toLong, h * 3600000000000L, i.toLong % 5, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SeriesQueries.queries("ts_kalman")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
  }

  private def refFold(series: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long, Boolean)] = {
    val q = BigInt(SeriesQueries.KalmanQ); val r = BigInt(SeriesQueries.KalmanR)
    val m = BigInt(1000000)
    var x = BigInt(series.head._2); var p = r
    var out = Vector((series.head._1, series.head._2, x.toLong, p.toLong, 1000000L, false))
    for ((bucket, z) <- series.tail) {
      val pp = p + q
      val k = pp * m / (pp + r)
      val e = BigInt(z) - x
      val outlier = e * e > 9 * (pp + r) * m
      x = x + k * e / m // BigInt / truncates toward zero, like Long
      p = (m - k) * pp / m
      out :+= ((bucket, z, x.toLong, p.toLong, k.toLong, outlier))
    }
    out
  }

  test("filter equals the independent BigInt fold, spike flagged, quiet not") {
    val quiet = (0L until 40L).map(h => ("a", h, 50.0 + (h % 3).toDouble))
    val spike = Seq(("a", 40L, 400.0)) // |e| = 350 >> 3σ ≈ 164
    val after = (41L until 50L).map(h => ("a", h, 50.0))
    val other = (0L until 30L).map(h => ("b", h, 10.0 + (h % 2).toDouble))
    val got = run(quiet ++ spike ++ after ++ other)
    val bySeries = got.groupBy(_._1)
    for ((tpe, rows) <- bySeries) {
      val series = rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq
      val want = refFold(series)
      assert(rows.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSeq
        === want, s"trajectory diverged for $tpe")
    }
    val a = bySeries("a").sortBy(_._2)
    val flagged = a.filter(_._7).map(_._2).toSeq
    // the spike trips the gate; the level then overshoots and the next
    // few innovations echo — honest filter behavior. Nothing BEFORE the
    // spike may fire, and the echo must die out by the series end.
    assert(flagged.headOption.contains(40L), s"spike must be the first flag: $flagged")
    assert(flagged.forall(b => b >= 40L && b <= 44L), s"flags outside the echo: $flagged")
    assert(bySeries("b").forall(!_._7), "constant-ish series must stay quiet")
  }

  test("an extreme jump whose e-squared would overflow Long still flags") {
    // |e| ~ 3.99e9 micros: unclamped e*e wraps negative (1.6e19 > Long.Max)
    // and the flag would silently read false; the clamp keeps it true
    val got = run(Seq(("a", 0L, 10.0), ("a", 1L, 4000.0), ("a", 2L, 10.0)))
      .sortBy(_._2)
    assert(got(1)._7, s"overflow-range innovation must be flagged: ${got.toSeq}")
  }

  test("variance converges to a steady state and the gain starts diffuse") {
    val got = run((0L until 140L).map(h => ("a", h, 100.0))).sortBy(_._2)
    assert(got.head._6 == 1000000L, "diffuse start: first gain = 1")
    val ps = got.map(_._5)
    // the truncating iteration contracts toward the fixed point (it may
    // overshoot by a few micros and creep back — not strictly monotone):
    // the last steps must be sub-100-micro, far below the prior
    val tailDeltas = ps.takeRight(10).sliding(2).map { case Array(a, b) => math.abs(b - a) }
    assert(tailDeltas.forall(_ < 100L), "P must be at steady state")
    assert(ps.last < SeriesQueries.KalmanR / 2, "steady-state P far below the prior")
    // constant series: level locks to the observation
    assert(got.last._4 == got.last._3)
  }
}
