package graft.streaming

import graft.TestSpark
import graft.core.Pfsa
import graft.pipeline.ContinuousDetection
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** True incremental execution of the online loop: the PFSA library lives in
  * flatMapGroupsWithState keyed state, so a pattern born in trigger 1 must
  * explain windows arriving in trigger 2 — the property that distinguishes
  * stateful streaming from per-batch recomputation. */
class ContinuousStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pattern library persists across streaming triggers") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Seq[Byte])]
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 0, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 50)
    val query = ContinuousStreaming.scores(input.toDS(), p)
      .writeStream.format("memory").queryName("cont_scores")
      .outputMode("append").start()
    try {
      // trigger 1: three M2 windows → bootstrap at window 0, no more births
      input.addData((0 until 3).map(i =>
        (0L, i.toLong, Pfsa.m2.sample(1000, seed = 50 + i).toSeq)): _*)
      query.processAllAvailable()
      val t1 = spark.table("cont_scores").collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)
      assert(t1.map(_._1).toSeq == Seq(0L, 1L, 2L))
      assert(t1.head._2 && t1.head._4 == 1, "window 0 must bootstrap pattern 0")
      assert(t1.tail.forall(r => !r._2 && r._3 == 0), "M2 windows must ride pattern 0")

      // trigger 2: two M2_u windows → ONE new pattern, born against the
      // library carried over in state (n_patterns goes 1 → 2, not back to 1)
      input.addData(
        (0L, 3L, Pfsa.m2u.sample(1000, seed = 60).toSeq),
        (0L, 4L, Pfsa.m2u.sample(1000, seed = 61).toSeq))
      query.processAllAvailable()
      val t2 = spark.table("cont_scores").collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)
      val w3 = t2.find(_._1 == 3L).get
      val w4 = t2.find(_._1 == 4L).get
      assert(w3._2 && w3._4 == 2,
        s"window 3 must birth pattern 1 against the persisted library: $w3")
      assert(!w4._2 && w4._3 == 1,
        s"window 4 must be explained by the pattern born last trigger: $w4")
    } finally query.stop()
  }

  test("library survives a checkpoint restart (stop query, recover, keep growing)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Seq[Byte])]
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 0, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 50)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    // file sink (the memory sink cannot recover from a checkpoint): the
    // production shape — append to parquet, state in the checkpointed store
    def start() = ContinuousStreaming.scores(input.toDS(), p)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      input.addData((0 until 3).map(i =>
        (0L, i.toLong, Pfsa.m2.sample(1000, seed = 50 + i).toSeq)): _*)
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the SAME checkpoint; the keyed state (the pattern
    // library) must come back from the state store, not start empty
    val q2 = start()
    try {
      input.addData(
        (0L, 3L, Pfsa.m2u.sample(1000, seed = 60).toSeq),
        (0L, 4L, Pfsa.m2u.sample(1000, seed = 61).toSeq))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L), rows.toSeq.toString)
    val w3 = rows.find(_._1 == 3L).get
    val w4 = rows.find(_._1 == 4L).get
    assert(w3._2 && w3._4 == 2,
      s"after restart, window 3 must birth pattern 1 AGAINST the recovered library: $w3")
    assert(!w4._2 && w4._3 == 1,
      s"after restart, window 4 must ride the pattern born post-recovery: $w4")
  }

  test("watermark variant repairs out-of-order windows and drops beyond-lateness stragglers") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 0, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 50)
    val t0 = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000L)
    val w = (0 to 3).map(i =>
      if (i < 3) Pfsa.m2.sample(1000, seed = 50 + i).toSeq
      else Pfsa.m2u.sample(1000, seed = 60).toSeq)

    val input = MemoryStream[(Long, Long, Seq[Byte], java.sql.Timestamp)]
    val query = ContinuousStreaming.scoresWithWatermark(input.toDS(), p, delay = "10 seconds")
      .writeStream.format("memory").queryName("wm_scores")
      .outputMode("append").start()
    try {
      // trigger 1: windows 0 and 2 — the gap at 1 must HOLD window 2 in state
      input.addData((0L, 0L, w(0), ts(0)), (0L, 2L, w(2), ts(2)))
      query.processAllAvailable()
      assert(spark.table("wm_scores").collect().map(_.getLong(1)).toSet == Set(0L),
        "window 2 must wait for its predecessor")

      // trigger 2: the gap fills (in-lateness out-of-order) + window 3
      // arrives far ahead in event time, pushing the watermark past t0
      input.addData((0L, 1L, w(1), ts(1)), (0L, 3L, w(3), ts(100)))
      query.processAllAvailable()
      val got = spark.table("wm_scores").collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getInt(4), r.getInt(5)))
        .sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L), got.toSeq.toString)
      // library evolution identical to fully in-order delivery — llk
      // included: both paths run the same step kernel, so scores must be
      // bit-equal, not just structurally equal
      val want = ContinuousStreaming.scores(
        (0 to 3).map(i => (0L, i.toLong, w(i))).toDS(), p)
        .collect().map(r => (r.win_id, r.emerged, r.llk, r.closest, r.n_patterns)).sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"out-of-order repair diverged:\n$got\n$want")

      // trigger 3: a straggler for a NEW stream stamped beyond the allowed
      // lateness (watermark ≈ t0+90s) — filtered before the handler, no rows
      input.addData((7L, 0L, w(0), ts(0)))
      query.processAllAvailable()
      assert(spark.table("wm_scores").collect().forall(_.getLong(0) != 7L),
        "beyond-lateness straggler must be dropped by the watermark")
    } finally query.stop()
  }

  test("raw-symbol assembly: a 200k-symbol trigger folds linearly and matches the window path") {
    import spark.implicits._
    // one giant trigger: the advancing-offset scan must do O(n) element
    // moves (the old buf.remove(0, stride) was O(n²/stride) — round-4
    // verdict #6) and produce exactly the strided windows
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 500, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 20)
    val n = 200000
    val syms = Array.tabulate(n)(t => (t % 7 % 2).toByte)
    val rows = (0 until n).map(t => (0L, t.toLong, syms(t)))
    val got = ContinuousStreaming.scoresFromSymbols(rows.toDS(), p)
      .collect().map(r => (r.win_id, r.emerged, r.llk, r.closest, r.n_patterns)).sortBy(_._1)
    val stride = p.windowSize - p.windowOverlap
    val nWin = (n - p.windowSize) / stride + 1
    assert(got.length == nWin, s"expected $nWin windows, got ${got.length}")
    assert(got.map(_._1).toSeq == (0L until nWin.toLong))
    // same library evolution as the pre-assembled window path — llk included
    // (bit-equal scores catch a one-symbol drift in the offset arithmetic
    // that the structural fields would mask)
    val wins = (0 until nWin).map { w =>
      (0L, w.toLong, syms.slice(w * stride, w * stride + p.windowSize).toSeq)
    }
    val want = ContinuousStreaming.scores(wins.toDS(), p)
      .collect().map(r => (r.win_id, r.emerged, r.llk, r.closest, r.n_patterns)).sortBy(_._1)
    assert(got.toSeq == want.toSeq, "raw-symbol assembly diverged from window path")
  }

  test("watermark variant abandons a permanently lost window once the watermark passes it") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 0, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 50)
    val t0 = 1700000000000L
    def ts(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000L)
    val w = (0 to 4).map(i => Pfsa.m2.sample(1000, seed = 70 + i).toSeq)

    val input = MemoryStream[(Long, Long, Seq[Byte], java.sql.Timestamp)]
    val query = ContinuousStreaming.scoresWithWatermark(input.toDS(), p, delay = "10 seconds")
      .writeStream.format("memory").queryName("wm_lost")
      .outputMode("append").start()
    try {
      // window 0 is NEVER delivered: 1 and 2 buffer behind the hole
      input.addData((0L, 1L, w(1), ts(1)), (0L, 2L, w(2), ts(2)))
      query.processAllAvailable()
      assert(spark.table("wm_lost").count() == 0L, "hole must hold the fold at first")
      // event time jumps far ahead → the NEXT batch's watermark passes ts(1)
      input.addData((0L, 3L, w(3), ts(100)))
      query.processAllAvailable()
      // watermark (≈ ts(100) − 10 s) now exceeds the oldest buffered window's
      // event time: the hole at 0 can never fill, so this batch must abandon
      // it and score everything buffered plus the new arrival
      input.addData((0L, 4L, w(4), ts(101)))
      query.processAllAvailable()
      val got = spark.table("wm_lost").collect().map(_.getLong(1)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L, 4L),
        s"lost-window liveness failed: scored windows = ${got.toSeq}")
    } finally query.stop()
  }

  test("raw-symbol ingestion rejects a non-positive stride up front") {
    import spark.implicits._
    val bad = ContinuousDetection.Params(windowSize = 100, windowOverlap = 100)
    val ex = intercept[IllegalArgumentException] {
      ContinuousStreaming.scoresFromSymbols(Seq.empty[(Long, Long, Byte)].toDS(), bad)
    }
    assert(ex.getMessage.contains("windowOverlap"), ex.getMessage)
  }

  test("raw-symbol ingestion assembles windows in state and matches batch replay") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = ContinuousDetection.Params(
      windowSize = 1000, windowOverlap = 200, anomalySensitivity = 3.0,
      quantize = false, eps = 0.05, bootstrapRepeats = 50)
    val stream = Pfsa.m2.sample(2600, seed = 21L) ++ Pfsa.m2u.sample(2600, seed = 22L)

    val input = MemoryStream[(Long, Long, Byte)]
    val query = ContinuousStreaming.scoresFromSymbols(input.toDS(), p)
      .writeStream.format("memory").queryName("raw_scores")
      .outputMode("append").start()
    try {
      // feed in two triggers split at an awkward mid-window boundary
      val rows = stream.zipWithIndex.map { case (s, t) => (0L, t.toLong, s) }
      input.addData(rows.take(1700).toSeq: _*)
      query.processAllAvailable()
      input.addData(rows.drop(1700).toSeq: _*)
      query.processAllAvailable()
      val got = spark.table("raw_scores").collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)

      val long = stream.zipWithIndex
        .map { case (s, t) => (0L, t.toLong, s.toDouble) }.toSeq
        .toDF("seq_id", "t", "value")
      val want = ContinuousDetection.fitStream(spark, long, p).collect()
        .map(r => (r.getLong(1), r.getBoolean(2), r.getInt(4), r.getInt(5))).sortBy(_._1)
      assert(got.toSeq == want.toSeq,
        s"streaming assembly diverged:\n got=${got.toSeq}\nwant=${want.toSeq}")
      assert(got.nonEmpty)
    } finally query.stop()
  }
}
