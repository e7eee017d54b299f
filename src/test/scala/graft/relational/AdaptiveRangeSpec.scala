package graft.relational

import graft.text.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Density-adaptive range-ANN budget (r15 verdict ask #4): the knob
  * derivation's clamp/monotonicity contract, the density pre-pass's
  * exactness on small corpora, and the gate-invariance property the
  * shared oracle depends on — at gate-fixture densities the adaptive
  * knobs are EXACTLY the fixed defaults, so similarity_range_ann_adaptive
  * serves similarity_range_ann's oracle bit-identically. */
class AdaptiveRangeSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val tau = DataPipelineQueries.RangeTau

  test("gate-density knobs collapse to the fixed defaults") {
    // sf0.001 (N=500, ~4 in-radius) and sf0.1 (N=2000, ~15 in-radius)
    for ((n, nHat) <- Seq((500L, 3.7), (2000L, 14.7))) {
      val (tables, bits, cap) = Similarity.adaptiveRangeKnobs(n, nHat, tau)
      assert(tables === 8, s"n=$n tables")
      assert(bits === Similarity.adaptiveBits(n), s"n=$n bits")
      assert(cap === 256, s"n=$n cap")
    }
  }

  test("dense radii buy budget; clamps bound it") {
    def modeledRecall(tables: Int, bits: Int): Double = {
      val p = 1.0 - math.acos(tau) / math.Pi
      val p1 = math.min(1.0, math.pow(p, bits) * (1.0 + bits * (1.0 - p) / p))
      1.0 - math.pow(1.0 - p1, tables)
    }
    val (t0, b0, c0) = Similarity.adaptiveRangeKnobs(200000L, 40.0, tau)
    val (t1, b1, c1) = Similarity.adaptiveRangeKnobs(200000L, 2000.0, tau)
    // denser radius: wider buckets (fewer bits — the decisive lever, since
    // per-table collision p^bits rises geometrically) and a bigger cap;
    // tables may DROP when the bits cut already buys the target (at 40.0
    // the narrow-bucket geometry clamps at 32 tables still short of the
    // modeled 0.8, at 2000.0 the wide buckets reach it with fewer)
    assert(b1 < b0 && c1 > c0,
      s"sparse ($t0,$b0,$c0) vs dense ($t1,$b1,$c1)")
    assert(modeledRecall(t1, b1) >= 0.8,
      s"dense knobs ($t1,$b1) model ${modeledRecall(t1, b1)}")
    assert(modeledRecall(t1, b1) >= modeledRecall(t0, b0))
    // clamps: tables in [8,32], bucket floor 64 -> cap floor 256, cap roof
    val (tMax, _, cMax) = Similarity.adaptiveRangeKnobs(10000000L, 1e7, tau)
    assert(tMax <= 32 && cMax <= 16384)
    val (tMin, _, cMin) = Similarity.adaptiveRangeKnobs(500L, 0.0, tau)
    assert(tMin >= 8 && cMin >= 256)
  }

  test("cap grows and bits shrink monotonically with density") {
    val knobs = Seq(10.0, 100.0, 1000.0, 10000.0)
      .map(Similarity.adaptiveRangeKnobs(200000L, _, tau))
    knobs.sliding(2).foreach { case Seq((_, b0, c0), (_, b1, c1)) =>
      assert(b1 <= b0 && c1 >= c0, s"$knobs not monotone")
    }
  }

  test("density pre-pass is exact when the corpus fits the sample budget") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val (n, nHat) = Similarity.rangeDensity(e, q, tau)
    assert(n === e.count())
    // step = 1 -> the sample IS the corpus; nHat must equal the exact
    // leg's mean per-query hit count (same rounded-cosine test)
    val nExact = Similarity.bruteForceRange(e, q, tau).count()
    assert(math.abs(nHat - nExact.toDouble / 10.0) < 1e-9,
      s"nHat=$nHat vs exact mean ${nExact / 10.0}")
    // deterministic: re-run estimates identically (hash sample, no RNG)
    assert(Similarity.rangeDensity(e, q, tau) === ((n, nHat)))
  }

  test("adaptive search equals the fixed-budget search at gate density") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 10)
    val fixed = Similarity.annRange(e, q, tau)
    val adaptive = Similarity.annRangeAdaptive(e, q, tau)
    assert(adaptive.except(fixed).count() === 0L)
    assert(fixed.except(adaptive).count() === 0L)
  }
}
