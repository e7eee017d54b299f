package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The time-series/corpus-ops wave (SeriesQueries). Oracle parity for all
  * nine queries runs at the gate (and was verified at sf0.001/0.01/0.1);
  * these specs pin the semantics the value hash can't see: frame
  * exclusivity and flag gating (z-score), bar consistency (OHLC), the
  * truncated-EWMA recurrence against a driver recompute, interpolation
  * boundedness and grid contiguity, fuzzy-dedup blocking invariants,
  * split determinism and proportions, decile balance, the small-file
  * collapse itself, and the moments against an exact driver recompute.
  */
class SeriesQueriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SeriesQueries.queries(name)(spark, sf)

  // ------------------------------------------------------------- z-score
  test("ts_anomaly_zscore: baseline excludes the current row and gates on n>=5, std>0") {
    val rows = q("ts_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    // n_base is the trailing frame size: bounded by 20, zero for each user's first event
    assert(rows.forall(_.getLong(4) <= 20L))
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { rs =>
      val first = rs.minBy(r => (r.getLong(2), r.getLong(0)))
      assert(first.getLong(4) === 0L, "first event of a user has an empty baseline")
    }
    // gating: z present iff n_base >= 5 and std_r > 0
    rows.foreach { r =>
      val gated = r.getLong(4) >= 5 && !r.isNullAt(6) && r.getDouble(6) > 0
      assert(r.isNullAt(7) === !gated, s"z gating broken at event ${r.getLong(0)}")
      if (r.isNullAt(7)) assert(!r.getBoolean(8), "ungated row must not flag")
    }
    // self-exclusion: a spike's own value must not enter its baseline —
    // mean_r of the row AFTER a spike shifts, mean_r OF the spike doesn't.
    // Verified structurally: n_base counts only PRIOR rows (first-row case
    // above) and the frame is ROWS -20..-1 by construction; here we assert
    // at least one genuine flag fires somewhere in the fixture OR all z
    // stay moderate (both acceptable — flags depend on data), and every
    // flagged row indeed has |z| > 3 on the rounded value.
    rows.filter(_.getBoolean(8)).foreach { r =>
      assert(math.abs(r.getDouble(7)) > 3.0)
    }
  }

  // ---------------------------------------------------------------- OHLC
  test("ts_ohlc: bars are consistent and open/close match the bucket's first/last event") {
    val bars = q("ts_ohlc").collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val (hi, lo, op, cl) = (b.getDouble(4), b.getDouble(5), b.getDouble(3), b.getDouble(6))
      assert(lo <= hi); assert(op >= lo && op <= hi); assert(cl >= lo && cl <= hi)
      assert(b.getLong(2) >= 1L)
    }
    // re-derive one populous bucket's open/close by explicit sort
    val e = Tables.eventsTsUs(spark, sf).filter(col("value").isNotNull)
      .withColumn("bucket", expr("ts_us div 3600000000"))
    val target = bars.maxBy(_.getLong(2))
    val evs = e.filter(col("event_type") === target.getString(0) &&
        col("bucket") === target.getLong(1))
      .select(col("ts_us"), col("event_id"), col("value"))
      .collect().sortBy(r => (r.getLong(0), r.getLong(1)))
    assert(evs.head.getDouble(2) === target.getDouble(3), "open = first value by (ts, id)")
    assert(evs.last.getDouble(2) === target.getDouble(6), "close = last value by (ts, id)")
    assert(evs.length === target.getLong(2))
  }

  test("ts_ohlc plan: one hash aggregate, no window exchange") {
    val plan = q("ts_ohlc").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"OHLC must not need a window:\n$plan")
  }

  // ---------------------------------------------------------------- EWMA
  test("ts_ewma matches a driver-side truncated-EWMA recompute") {
    val rows = q("ts_ewma").collect()
    assert(rows.nonEmpty)
    val e = Tables.eventsTsUs(spark, sf).filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .collect()
    val expect = e.groupBy(_.getLong(0)).toSeq.flatMap { case (u, rs) =>
      val ord = rs.sortBy(r => (r.getLong(2), r.getLong(1)))
      ord.zipWithIndex.map { case (r, i) =>
        val frame = ord.slice(math.max(0, i - 19), i + 1).map(_.getDouble(3))
        val n = frame.length
        // weights: newest gets 0.7^0, oldest in frame 0.7^(n-1); fold oldest->newest
        val num = frame.zipWithIndex.map { case (v, j) => v * math.pow(0.7, n - 1 - j) }.sum
        val den = (1.0 - math.pow(0.7, n)) / 0.3
        (u, r.getLong(1)) -> BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(4) - expect(k)) < 2e-6, s"ewma mismatch at $k")
    }
  }

  test("ts_ewma: a user's first event smooths to its own value") {
    val rows = q("ts_ewma").collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val first = rs.minBy(r => (r.getLong(2), r.getLong(1)))
      assert(math.abs(first.getDouble(4) - first.getDouble(3)) < 1e-9)
    }
  }

  // -------------------------------------------------------- interpolation
  test("ts_interpolate: observed buckets keep their means; gaps stay between neighbors; grid contiguous") {
    val rows = q("ts_interpolate").collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val ord = rs.sortBy(_.getLong(1))
      // contiguity: buckets form an unbroken range
      assert(ord.last.getLong(1) - ord.head.getLong(1) + 1 === ord.length.toLong)
      // edges are observed (min/max buckets come from real events)
      assert(!ord.head.getBoolean(3) && !ord.last.getBoolean(3))
      // every gap value lies within [min, max] of the surrounding observed values
      val obs = ord.filter(!_.getBoolean(3)).map(r => r.getLong(1) -> r.getDouble(4)).toMap
      ord.filter(_.getBoolean(3)).foreach { g =>
        val b = g.getLong(1)
        val prev = obs.keys.filter(_ < b).max
        val next = obs.keys.filter(_ > b).min
        val (lo, hi) = (math.min(obs(prev), obs(next)), math.max(obs(prev), obs(next)))
        assert(g.getDouble(4) >= lo - 1e-9 && g.getDouble(4) <= hi + 1e-9,
          s"interp at bucket $b escapes its bracket")
      }
    }
  }

  test("ts_interpolate: a midpoint gap interpolates to the exact average of its neighbors") {
    // synthetic 3-bucket check through the same plan-building blocks:
    // verified on fixture rows where prev/next are 2 buckets apart
    val rows = q("ts_interpolate").collect()
    val byUser = rows.groupBy(_.getLong(0))
    var checked = 0
    byUser.values.foreach { rs =>
      val ord = rs.sortBy(_.getLong(1))
      ord.sliding(3).foreach {
        case Array(a, g, b) if !a.getBoolean(3) && g.getBoolean(3) && !b.getBoolean(3) =>
          val mid = (a.getDouble(4) + b.getDouble(4)) / 2.0
          assert(math.abs(g.getDouble(4) - mid) < 1e-6); checked += 1
        case _ =>
      }
    }
    assert(checked > 0, "fixture contains no isolated 1-bucket gaps to check")
  }

  // ---------------------------------------------------------- fuzzy dedup
  test("dedup_fuzzy: pairs respect blocking, ordering, cap, and the distance bound") {
    val pairs = q("dedup_fuzzy").collect()
    assert(pairs.nonEmpty, "fixture has exact-dup prefixes; fuzzy pass must find them")
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)), "pairs ordered, no self-pairs")
    assert(pairs.forall(_.getLong(2) <= 5L))
    val d = Tables.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 80).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    pairs.foreach { r =>
      val (la, pa) = d(r.getLong(0)); val (lb, pb) = d(r.getLong(1))
      assert(la === lb, "cross-language pair leaked through blocking")
      // recompute the edit distance on the same operands
      val dist = {
        val (x, y) = (pa, pb)
        val dp = Array.tabulate(y.length + 1)(identity)
        for (i <- 1 to x.length) {
          var prev = dp(0); dp(0) = i
          for (j <- 1 to y.length) {
            val t = dp(j)
            dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
              prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
            prev = t
          }
        }
        dp(y.length)
      }
      assert(dist.toLong === r.getLong(2), s"distance mismatch for pair $r")
    }
  }

  // ---------------------------------------------------------------- split
  test("sample_split: total, determinism, and hash-proportionality") {
    val a = q("sample_split").collect()
    val b = q("sample_split").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "split must be deterministic")
    val n = Tables.tbl(spark, sf, "documents").count()
    assert(a.length.toLong === n, "every document assigned exactly once")
    val frac = a.groupBy(_.getString(2)).view.mapValues(_.length.toDouble / a.length).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.04 && frac("val") < 0.16)
    assert(frac("test") > 0.04 && frac("test") < 0.16)
  }

  // --------------------------------------------------------------- ntile
  test("window_ntile: ten balanced, ordered, non-overlapping deciles") {
    val rows = q("window_ntile").collect().sortBy(_.getLong(0))
    assert(rows.length === 10)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L, "ntile buckets must differ by at most one row")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(3) <= hi.getLong(2), "decile ranges must not overlap")
    case _ => }
  }

  // ---------------------------------------------------------- compaction
  test("compact_small_files: 64 scattered files collapse to the planned right-sized count") {
    val (nSmall, bytes, nPlanned, nActual) = SeriesQueries.compactCounts(spark, sf)
    assert(nSmall === 64)
    assert(nPlanned === nActual, "compacted write must produce exactly the planned file count")
    assert(nActual < nSmall, "compaction must reduce the file count")
    assert(nPlanned === math.max(1, math.ceil(bytes.toDouble / SeriesQueries.CompactTargetBytes).toInt))
  }

  test("compact_small_files: the compacted copy aggregates identically to the source") {
    val got = q("compact_small_files").collect().map(_.toSeq).toSet
    val want = Tables.tbl(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        countDistinct(col("doc_id")).as("n_distinct"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  // ------------------------------------------------------------- moments
  test("agg_moments matches an exact driver recompute of the centered moments") {
    val rows = q("agg_moments").collect()
    assert(rows.length === 3)
    val li = Tables.tbl(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
    rows.foreach { r =>
      val xs = li.filter(_.getString(0) == r.getString(0)).map(_.getDouble(1))
      val n = xs.length.toDouble
      val meanR = BigDecimal(xs.sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val m2 = xs.map(x => math.pow(x - meanR, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - meanR, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - meanR, 4)).sum / n
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(3) - math.sqrt(m2)) < 1e-3)
      assert(math.abs(r.getDouble(4) - m3 / math.pow(m2, 1.5)) < 1e-4)
      assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3)) < 1e-4)
    }
  }
}
