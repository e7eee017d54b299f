package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE EVIDENCE for the graph family's bucketed ANN edge build: the
  * fixtures (500-2,000 vectors) are small enough that the probed buckets
  * cover most pairs, so correctness there says nothing about whether the
  * geometry actually PRUNES as the corpus grows — the whole point of the
  * swap. This spec builds a 8,192-vector clustered synthetic corpus
  * (seeded, 32-dim, 64 planted centers — clustered because at scale real
  * embedding neighbors are close, which is what LSH prunes FOR) and
  * checks the two scale claims directly:
  *   1. the adaptive code width grows (bits 7 at 8k vs 4-5 at fixtures)
  *      and the probed-candidate fraction drops well below the ~80% the
  *      fixtures see;
  *   2. recall vs the exact top-k survives the narrower buckets on probe
  *      nodes.
  * The Spark plan is exercised end-to-end (annKnnEdges on the synthetic
  * frame) and cross-checked against GraphTestUtil's pure-Scala recompute.
  */
class AnnScaleSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private val N = 8192
  private val Dim = 32
  private val Centers = 256

  // deterministic clustered corpus: center + noise, fixed seed; the SAME
  // distribution at every N so fraction comparisons isolate the geometry
  private def gen(n: Int): Map[Long, Array[Double]] = {
    val rnd = new scala.util.Random(20260814L)
    val centers = Array.fill(Centers, Dim)(rnd.nextGaussian())
    (0L until n).map { v =>
      val c = centers((v % Centers).toInt)
      v -> Array.tabulate(Dim)(i => c(i) + 0.5 * rnd.nextGaussian())
    }.toMap
  }

  private lazy val corpus: Map[Long, Array[Double]] = gen(N)

  private def probedFraction(emb: Map[Long, Array[Double]]): Double = {
    val n = emb.size
    val bits = GraphTestUtil.bitsFor(n)
    val codes = GraphTestUtil.annCodes(emb, tables = 8, bits = bits)
    val bucketSizes = codes.toSeq.groupBy { case ((_, t), c) => (t, c) }
      .view.mapValues(_.size).toMap
    // probed candidates per node: own bucket + the `bits` flip buckets,
    // per table (the engine's radius-1 multiprobe); an upper bound on the
    // distinct-candidate fraction (duplicates across tables collapse)
    val fracs = emb.keys.toSeq.map { v =>
      val cand = (0 until 8).flatMap { t =>
        val own = codes((v, t))
        (own +: (0 until bits).map(b => own ^ (1L << b)))
          .map(p => bucketSizes.getOrElse((t, p), 0))
      }.sum
      math.min(1.0, cand.toDouble / n)
    }
    fracs.sum / fracs.length
  }

  test("adaptive bits grow with N and the probed-candidate fraction shrinks") {
    val bits = GraphTestUtil.bitsFor(N)
    assert(bits === 7, "64-target geometry at 8k vectors")
    assert(bits > GraphTestUtil.bitsFor(2000), "code width must grow with the corpus")
    val fracSmall = probedFraction(gen(2048))
    val fracBig = probedFraction(corpus)
    // same distribution, 4x the vectors: the adaptive width must push the
    // probed fraction DOWN — constant-fraction probing is the classic
    // fixed-geometry LSH scale trap this build exists to avoid
    assert(fracBig < 0.85 * fracSmall,
      s"probed fraction did not shrink: $fracSmall @2k -> $fracBig @8k")
  }

  test("Spark edge build equals the pure-Scala recompute EXACTLY on random corpora") {
    // three seeded random corpora, full edge-set equality — the strongest
    // cross-implementation property available (the oracle is the third
    // leg; this pins Spark vs the collections recompute edge-for-edge)
    Seq(1L, 2L, 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val emb = (0L until 200L).map(v =>
        v -> Array.fill(16)(rnd.nextGaussian())).toMap
      val df = emb.toSeq.sortBy(_._1).map { case (v, a) => (v, a.toSeq) }
        .toDF("vec_id", "v")
        .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      val sparkEdges = AnalyticsQueries.annKnnEdges(df, checkpoint = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val refEdges = GraphTestUtil.annEdges(emb).toSeq
        .flatMap { case (s0, ds) => ds.map(d => (s0, d)) }.toSet
      assert(sparkEdges === refEdges, s"edge sets diverged for seed $seed")
    }
  }

  test("recall vs exact top-3 holds at 8k vectors through the REGISTERED Spark build") {
    val df = corpus.toSeq.sortBy(_._1)
      .map { case (v, arr) => (v, arr.toSeq) }
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val edges = AnalyticsQueries.annKnnEdges(df, checkpoint = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact leg on 48 probe nodes spanning many planted clusters
    val probes = (0L until 48L).map(_ * 167L % N)
    val hits = probes.map { p =>
      val exact = corpus.keys.filter(_ != p).toSeq
        .map(d => (d, GraphTestUtil.r6(GraphTestUtil.cos(corpus(p), corpus(d)))))
        .sortBy { case (d, c) => (-c, d) }.take(3).map(_._1)
      val got = edges.getOrElse(p, Set.empty)
      exact.count(got.contains).toDouble / exact.size
    }
    val mean = hits.sum / hits.size
    assert(mean >= 0.8, s"mean recall $mean at N=$N below the 0.8 floor")
  }
}
