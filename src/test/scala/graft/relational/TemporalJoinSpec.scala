package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the temporal joins: as-of picks the most
  * recent reference at-or-before each event per key (inclusive, dedup to
  * max ref id at equal timestamps), range aggregates events falling inside
  * each interval — including events landing in a different hour-bucket
  * than the interval's start. */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (event_id, event_type, ts_us) → an events.parquet with ts as LONG
    * nanoseconds (the same shape Tables.events surfaces for the driver's
    * TIMESTAMP(NANOS) fixtures). */
  private def writeEvents(rows: Seq[(Long, String, Long)], tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    rows.map { case (id, tp, tsUs) => (id, tsUs * 1000L, id, tp, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // refs are the event_id % 50 == 0 rows: 0 and 50 for type a; 100 and 150
  // both at ts 9999 for type b (the dedup-to-max-id tie case)
  private val fixture = Seq(
    (0L, "a", 1000L), (1L, "a", 500L), (2L, "a", 1000L), (3L, "a", 5000L),
    (4L, "a", 6500L), (50L, "a", 6000L),
    (5L, "b", 9999L), (100L, "b", 9999L), (150L, "b", 9999L))

  test("join_asof: inclusive latest-ref semantics, ref dedup, unmatched -> null") {
    val dir = writeEvents(fixture, "asof")
    val rows = graft.relational.RelationalQueries.queries("join_asof")(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    val expected = Seq(
      0L -> (Some(0L), Some(0L)),     // ref at the SAME ts matches (inclusive)
      1L -> (None, None),             // before the first ref
      2L -> (Some(0L), Some(0L)),
      3L -> (Some(0L), Some(4000L)),
      4L -> (Some(50L), Some(500L)),  // the LATER ref wins
      5L -> (Some(150L), Some(0L)),   // equal-ts refs dedup to max id
      50L -> (Some(50L), Some(0L)),
      100L -> (Some(150L), Some(0L)),
      150L -> (Some(150L), Some(0L)))
    assert(rows == expected.map { case (id, (ref, lag)) => (id, ref, lag) },
      s"as-of mismatch: $rows")
  }

  test("join_asof_forward: earliest-ref-at-or-after via the negated backward plan") {
    val dir = writeEvents(fixture, "asoffwd")
    val rows = graft.relational.RelationalQueries.queries("join_asof_forward")(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    val expected = Seq(
      0L -> (Some(0L), Some(0L)),      // ref at the SAME ts matches (inclusive)
      1L -> (Some(0L), Some(500L)),    // next ref is ahead
      2L -> (Some(0L), Some(0L)),
      3L -> (Some(50L), Some(1000L)),  // the EARLIER upcoming ref wins
      4L -> (None, None),              // after the last ref
      5L -> (Some(150L), Some(0L)),    // equal-ts refs dedup to max id
      50L -> (Some(50L), Some(0L)),
      100L -> (Some(150L), Some(0L)),
      150L -> (Some(150L), Some(0L)))
    assert(rows == expected.map { case (id, (ref, lead)) => (id, ref, lead) },
      s"forward as-of mismatch: $rows")
  }

  test("join_asof_nearest: closer side wins, exact midpoint ties to backward") {
    val dir = writeEvents(fixture, "asofnear")
    val rows = graft.relational.RelationalQueries.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    // from the shared fixture (refs a: 0@1000, 50@6000; b: 150@9999):
    assert(rows(1L) == ((Some(0L), Some(500L))), "only-forward side must match")
    assert(rows(3L) == ((Some(50L), Some(1000L))), "the closer FORWARD ref must win")
    assert(rows(4L) == ((Some(50L), Some(500L))), "only-backward side must match")
    assert(rows(0L) == ((Some(0L), Some(0L))) && rows(5L) == ((Some(150L), Some(0L))))
  }

  test("join_asof_nearest: exact midpoint between two refs ties to the backward one") {
    val dir = writeEvents(Seq(
      (0L, "a", 1000L), (50L, "a", 3000L), (7L, "a", 2000L)), "asofmid")
    val rows = graft.relational.RelationalQueries.queries("join_asof_nearest")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    assert(rows(7L) == ((0L, 1000L)), s"midpoint must tie backward: ${rows(7L)}")
  }

  test("join_asof: ref/event pairs straddling hour-bucket boundaries stitch correctly") {
    val hourUs = 3600L * 1000000L
    // type a: ref 0 in bucket 0; events 2 and 5 in ref-free buckets that
    // must take the CARRIED reference; ref 50 exactly ON the bucket-3
    // boundary (event 3 at the same ts matches inclusively, event 4 one
    // µs earlier in bucket 2 must NOT see it); type b isolates keys
    val dir = writeEvents(Seq(
      (0L, "a", 1000L), (1L, "a", 500L),
      (2L, "a", 2 * hourUs + 5L),
      (50L, "a", 3 * hourUs), (3L, "a", 3 * hourUs), (4L, "a", 3 * hourUs - 1L),
      (5L, "a", 5 * hourUs + 7L),
      (100L, "b", 10 * hourUs), (6L, "b", 12 * hourUs), (7L, "b", 0L)), "asofstraddle")
    val df = graft.relational.RelationalQueries.queries("join_asof")(spark, dir)
    val rows = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    val expected = Seq(
      0L -> (Some(0L), Some(0L)),
      1L -> (None, None),                          // before the first ref
      2L -> (Some(0L), Some(2 * hourUs - 995L)),   // carried across 2 buckets
      3L -> (Some(50L), Some(0L)),                 // boundary ref, inclusive
      4L -> (Some(0L), Some(3 * hourUs - 1001L)),  // 1 µs before the boundary ref
      5L -> (Some(50L), Some(2 * hourUs + 7L)),    // carried across a ref-free bucket
      6L -> (Some(100L), Some(2 * hourUs)),        // keys don't bleed
      7L -> (None, None),
      50L -> (Some(50L), Some(0L)),
      100L -> (Some(100L), Some(0L)))
    assert(rows == expected.map { case (id, (ref, lag)) => (id, ref, lag) },
      s"straddle mismatch: $rows")
  }

  test("join_asof: the as-of window partitions by (key, ts_bucket), not the key alone") {
    val hourUs = 3600L * 1000000L
    val dir = writeEvents(
      (0L to 200L).map(i => (i, "a", i * hourUs / 10)), "asofplan")
    val df = graft.relational.RelationalQueries.queries("join_asof")(spark, dir)
    val winLines = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // the per-row as-of window (the one computing last(ref_id)) must carry
    // ts_bucket in its partition spec — that is what makes partition count
    // scale with the time span instead of the key cardinality
    val asofWin = winLines.filter(_.contains("ref_id"))
    assert(asofWin.nonEmpty, s"no as-of window found in:\n$winLines")
    assert(asofWin.forall(_.contains("ts_bucket")),
      s"as-of window not bucket-partitioned:\n$asofWin")
  }

  test("join_range: per-interval membership counts, cross-bucket events included") {
    // interval lengths are now id-dependent (15 min x (1 + id/50 % 16)):
    // 0 -> 15 min, 50 -> 30 min, 100 -> 45 min, 150 -> 60 min, 200 -> 75 min.
    // The type-c interval starts 100 us before an hour boundary; its event
    // at +100 us sits past that boundary — the tiered bucketization's
    // second exploded row must still catch it
    val hourUs = 3600L * 1000000L
    val dir = writeEvents(fixture ++ Seq(
      (200L, "c", hourUs - 100L), (6L, "c", hourUs + 100L)), "range")
    val rows = graft.relational.RelationalQueries.queries("join_range")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (0L, "a", 5L, 0L, 50L),     // a-events in [1000, 1h+1000]
      (50L, "a", 2L, 4L, 50L),    // only ts >= 6000 remain
      (100L, "b", 3L, 5L, 150L),
      (150L, "b", 3L, 5L, 150L),
      (200L, "c", 2L, 6L, 200L)), // catches the event across the hour boundary
      s"range mismatch: $rows")
  }

  test("join_range: heavy-tailed interval lengths keep tier fan-out bounded and results exact") {
    import spark.implicits._
    val base = 900L * 1000000L
    val rnd = new scala.util.Random(11)
    def r(bound: Long): Long = math.floorMod(rnd.nextLong(), bound)
    // lengths from 1x to ~1000x the base (squared-uniform: heavy tail)
    val iv = (0 until 40).map { i =>
      val start = r(100L * base)
      val u = rnd.nextDouble()
      (i.toLong, "t" + (i % 3), start, start + ((u * u * 999 + 1) * base).toLong)
    }.toDF("interval_id", "event_type", "start_us", "end_us")
    val ev = (0 until 500).map { j =>
      (1000L + j, "t" + (j % 3), r(1100L * base))
    }.toDF("event_id", "event_type", "ts_us")
    val maxLen = iv.agg(max(col("end_us") - col("start_us"))).head().getLong(0)
    val tiers = RelationalQueries.rangeTiers(base, maxLen)
    assert(tiers <= 6, s"tier ladder too tall for a 1000x spread: $tiers")
    val ib = RelationalQueries.rangeBuckets(iv, base, tiers)
    assert(ib.count() <= 2L * 40,
      "interval fan-out exceeded 2 bucket rows per interval")
    val probes = RelationalQueries.rangeEventProbes(ev, base, tiers)
    assert(probes.count() == tiers.toLong * 500, "event probes != tiers x events")
    val cand = ib.join(probes, Seq("event_type", "tier", "bucket"))
      .filter(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .select(col("interval_id"), col("event_id"))
    val got = cand.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = iv.join(ev, Seq("event_type"))
      .filter(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .select(col("interval_id"), col("event_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.toSet == want,
      s"tiered join diverged: missing=${(want -- got.toSet).take(5)} extra=${(got.toSet -- want).take(5)}")
    // a pair meets in exactly one (tier, bucket): no dedup stage needed
    assert(got.size == want.size, s"duplicate candidate pairs: ${got.size} vs ${want.size}")
  }

  test("window_sessionize: multi-event users split exactly at the gap threshold") {
    import spark.implicits._
    val m30 = 30L * 60L * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("sess2").toString
    // user 7: events at 0, 100, m30+100 (gap exactly m30 → SAME session),
    // then 2*m30+101 (gap m30+1 → NEW session); user 8: one event
    Seq((0L, 0L, 7L), (1L, 100L, 7L), (2L, 100L + m30, 7L),
      (3L, 101L + 2 * m30, 7L), (4L, 42L, 8L))
      .map { case (id, tsUs, u) => (id, tsUs * 1000L, u, "a", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.relational.RelationalQueries.queries("window_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows == Seq(
      (7L, 0L, 3L, 0L, 100L + m30, 100L + m30),
      (7L, 1L, 1L, 101L + 2 * m30, 101L + 2 * m30, 0L),
      (8L, 0L, 1L, 42L, 42L, 0L)), s"sessionize mismatch: $rows")
  }

  test("join_asof_tolerance: boundary-inclusive keep, beyond-tolerance nulls, no-match stays null") {
    val tol = 7200000000L // the registered query's 2 h
    val dir = writeEvents(Seq(
      (50L, "a", 0L),      // the only type-a reference (and its own 0-lag event)
      (1L, "a", tol),      // exactly tol behind the ref -> KEPT (inclusive)
      (2L, "a", tol + 1L), // 1 µs beyond -> match REJECTED, row survives nulled
      (3L, "b", 42L)),     // no type-b reference -> null like plain as-of
      "asoftol")
    val rows = graft.relational.RelationalQueries.queries("join_asof_tolerance")(spark, dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(rows == Seq(
      (1L, Some(50L), Some(tol)),
      (2L, None, None),
      (3L, None, None),
      (50L, Some(50L), Some(0L))), s"tolerance semantics broken: $rows")
  }
}
