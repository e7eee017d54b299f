package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LTTB contracts via a full independent driver recompute: anchors are
  * the series endpoints, exactly 20 points per (down-sampled) type, every
  * selection maximizes the triangle area against the previous selection
  * and the next bucket's average under the same integer arithmetic. */
class LttbSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ts_downsample_lttb matches an independent driver LTTB over the hourly series") {
    val rows = SeriesQueries.queries("ts_downsample_lttb")(spark, sf).collect()
    // independent hourly series recompute
    val hourly = Tables.eventsTsUs(spark, sf)
      .filter(col("value").isNotNull)
      .withColumn("bucket", expr("ts_us div 3600000000"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(expr("cast(round(value * 1e6) as long)")).as("m"), count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"),
        round(col("m").cast("double") / 1e6 / col("n"), 6).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = rows.groupBy(_.getString(0))
    got.foreach { case (tpe, sel) =>
      val series = hourly(tpe).sortBy(_._2)
      val t = series.length
      val ym = series.map(p => math.round(p._3 * 1e6))
      if (t <= 20) {
        assert(sel.length === t, s"$tpe: short series passes through")
      } else {
        assert(sel.length === 20, s"$tpe: exactly 20 points")
        val selBuckets = sel.sortBy(_.getLong(1)).map(_.getLong(2))
        assert(selBuckets.head === series.head._2 && selBuckets.last === series.last._2,
          s"$tpe: both anchors kept")
        // replay the recurrence
        val m = t - 2
        val bidxOf = (j: Int) => ((j - 1).toLong * 18 / m).toInt
        val byB = (1 to m).groupBy(bidxOf)
        var p = 0
        val picked = Seq.newBuilder[Int]
        picked += 0
        for (b <- 0 until 18) {
          val (nn, sx, sy) =
            if (b == 17) (1L, series(t - 1)._2, ym(t - 1))
            else {
              val js = byB(b + 1)
              (js.size.toLong, js.map(j => series(j)._2).sum, js.map(ym(_)).sum)
            }
          val best = byB(b).minBy { j =>
            val a = math.abs((nn * series(p)._2 - sx) * (ym(j) - ym(p))
              - (series(p)._2 - series(j)._2) * (nn * ym(p) - sy))
            (-a, j)
          }
          picked += best
          p = best
        }
        picked += t - 1
        assert(selBuckets.toSeq === picked.result().map(series(_)._2),
          s"$tpe: selection diverges from the independent recurrence")
      }
    }
  }
}
