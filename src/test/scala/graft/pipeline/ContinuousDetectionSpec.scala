package graft.pipeline

import graft.TestSpark
import graft.core.Pfsa
import org.scalatest.funsuite.AnyFunSuite

/** Golden test for the online library-growth loop (reference
  * ContinuousStreamingDetection, detection.py:616-734; test design per
  * SURVEY.md §5 item 3): one long M2-generated stream with a contiguous
  * M2_u segment spliced into the middle. Expected: pattern emergence at
  * window 0 (library bootstrap, detection.py:653-657) and again when the
  * stream enters the M2_u regime; windows inside a regime after its pattern
  * emerged are explained by that pattern. */
class ContinuousDetectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val winSize = 1000

  // stream: 10 windows of M2, then 10 of M2_u, then 10 of M2 again
  private def stream: Array[Byte] =
    Pfsa.m2.sample(10 * winSize, seed = 7L) ++
    Pfsa.m2u.sample(10 * winSize, seed = 8L) ++
    Pfsa.m2.sample(10 * winSize, seed = 9L)

  private def longForm(syms: Array[Byte], sid: Long = 0L) =
    syms.zipWithIndex.map { case (s, t) => (sid, t.toLong, s.toDouble) }
      .toSeq.toDF("seq_id", "t", "value")

  private val params = ContinuousDetection.Params(
    windowSize = winSize, windowOverlap = 0, anomalySensitivity = 3.0,
    quantize = false, eps = 0.05, bootstrapRepeats = 50)

  test("emergence at window 0 and at the M2→M2_u regime change") {
    val out = ContinuousDetection.fitStream(spark, longForm(stream), params)
      .collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5)))
      .sortBy(_._1)
    val emergence = out.filter(_._2).map(_._1)
    assert(emergence.contains(0L), s"no bootstrap emergence: ${emergence.toSeq}")
    assert(emergence.contains(10L), s"regime change at window 10 missed: ${emergence.toSeq}")
    // no spurious pattern births inside the leading M2 run
    assert(emergence.count(w => w > 0 && w < 10) == 0,
      s"spurious emergence in M2 run: ${emergence.toSeq}")
    // M2_u windows after emergence are explained by the SECOND pattern,
    // and the trailing M2 windows fall back to the first
    val closingM2u = out.filter(r => r._1 > 10 && r._1 < 20)
    assert(closingM2u.forall(_._3 == 1), s"M2_u windows not on pattern 1: ${closingM2u.toSeq}")
    val trailing = out.filter(r => r._1 >= 20)
    assert(trailing.forall(_._3 == 0), s"trailing M2 windows not on pattern 0: ${trailing.toSeq}")
  }

  test("independent streams grow independent libraries in parallel") {
    val two = longForm(Pfsa.m2.sample(5 * winSize, seed = 11L), sid = 0L)
      .union(longForm(Pfsa.m2u.sample(5 * winSize, seed = 12L), sid = 1L))
    val out = ContinuousDetection.fitStream(spark, two, params).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getInt(5)))
    // independence: EACH stream's window 0 bootstraps from an EMPTY library
    // (emerged, library size exactly 1 after it) — a shared library would
    // leave the second stream's window 0 non-emergent or at size 2
    Seq(0L, 1L).foreach { sid =>
      val w0 = out.find(r => r._1 == sid && r._2 == 0L).get
      assert(w0._3, s"stream $sid window 0 did not bootstrap")
      assert(w0._4 == 1, s"stream $sid window 0 saw a non-empty library")
    }
  }

  test("verdict grid is all-true over the full window universe, including a grown library") {
    // the regime-change stream: library provably reaches size ≥ 2, so the
    // grid exercises multi-entry rule evaluation, version reconstruction,
    // and the codec round-trip — not just the window-0 bootstrap
    val grid = ContinuousDetection.verdictGrid(spark, longForm(stream), params).collect()
    assert(grid.length == 30, s"expected 30 windows, got ${grid.length}")
    grid.foreach { r =>
      assert((2 to 6).forall(r.getBoolean),
        s"verdict failed at win ${r.getLong(1)}: $r")
    }
    // sanity: the fold really emerged at least twice on this stream (the
    // grid certifying a 1-entry library throughout would be a weaker test)
    val births = ContinuousDetection.fitStream(spark, longForm(stream), params)
      .filter($"emerged").count()
    assert(births >= 2, s"expected >= 2 emergences, got $births")
  }

  test("verdict grid catches a tampered fold (wrong n_patterns bookkeeping)") {
    // feed the verdict pass evidence whose n_patterns is off by one: the
    // growth invariant must go false — proves the grid can actually fail
    import org.apache.spark.sql.functions.{col, lit}
    val ev = ContinuousDetection.fitStreamEvidence(spark, longForm(stream), params)
    val tampered = ev.withColumn("n_patterns", (col("n_patterns") + lit(1)).cast("int"))
      .as[ContinuousDetection.WindowEvidence]
    val grid = ContinuousDetection.verdictGrid0(tampered, params).collect()
    assert(grid.forall(!_.getBoolean(3)), "tampered n_patterns must fail growth_ok")
    assert(grid.forall(r => r.getBoolean(2) && r.getBoolean(5)),
      "unrelated verdicts must stay true")
  }

  test("verdict grid catches tampered bootstrap bounds (born_mean literal)") {
    // the r11 trust edge: born_mean/born_std used to ride as believed
    // literals — now the grid re-derives them through the seeded sampler,
    // so a nudged mean must fail bounds_ok at every emergence window and
    // nowhere else (non-emergence windows are vacuously true)
    import org.apache.spark.sql.functions.{col, lit, when}
    val ev = ContinuousDetection.fitStreamEvidence(spark, longForm(stream), params)
    val tampered = ev.withColumn("born_mean",
        when(col("emerged"), col("born_mean") + lit(0.5)).otherwise(col("born_mean")))
      .as[ContinuousDetection.WindowEvidence]
    val emergedWins = ev.filter(_.emerged).collect().map(_.win_id).toSet
    assert(emergedWins.nonEmpty)
    val grid = ContinuousDetection.verdictGrid0(tampered, params).collect()
    grid.foreach { r =>
      val wid = r.getLong(1)
      if (emergedWins.contains(wid))
        assert(!r.getBoolean(6), s"tampered born_mean must fail bounds_ok at win $wid")
      else
        assert(r.getBoolean(6), s"non-emergence win $wid must stay vacuously true")
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"growth/closest/llk verdicts must be untouched at win $wid: $r")
    }
  }

  test("streaming state handler matches the batch replay") {
    val wins = ContinuousDetection.segments(longForm(stream), params)
      .select($"seq_id".cast("long"), $"win_id".cast("long"), $"symbols")
      .as[(Long, Long, Seq[Byte])]
    val viaState = graft.streaming.ContinuousStreaming.scores(wins, params)
      .collect().map(w => (w.win_id, w.emerged, w.closest, w.n_patterns)).sortBy(_._1)
    val viaBatch = ContinuousDetection.fitStream(spark, longForm(stream), params)
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)
    assert(viaState.toSeq == viaBatch.toSeq)
  }
}
