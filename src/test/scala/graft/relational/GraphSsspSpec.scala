package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graph_sssp against a THIRD independent implementation: plain-Scala
  * Bellman–Ford over GraphTestUtil's recomputed weighted ANN edges —
  * plus the invariants the lexicographic DP must honor (seed rows pinned
  * at (0, 0), nonnegative distances, hop budget respected).
  */
class GraphSsspSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(seed: Long, n: Int): (String, Map[Long, Array[Double]]) = {
    val rnd = new scala.util.Random(seed)
    // quantize through float32 up front: the parquet fixture stores
    // float embeddings and the engine casts them BACK to double, so the
    // recompute must fold over the float-truncated values or it differs
    // by an ulp — enough to flip a 6-dp cosine boundary
    val emb = (0L until n.toLong).map { v =>
      v -> Array.fill(8)(rnd.nextGaussian().toFloat.toDouble)
    }.toMap
    val dir = java.nio.file.Files.createTempDirectory("sssp").toString
    emb.toSeq.sortBy(_._1)
      .map { case (v, a) => (v, a.map(_.toFloat), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (dir, emb)
  }

  /** Driver Bellman–Ford with the query's exact (dist, hops) lex order
    * over the recomputed undirected weighted edge set. */
  private def refSssp(emb: Map[Long, Array[Double]]): Map[Long, (Long, Long)] = {
    val und = scala.collection.mutable.Map.empty[(Long, Long), Double]
    for ((s, ds) <- GraphTestUtil.annEdgesCos(emb); (d, c) <- ds; e <- Seq((s, d), (d, s)))
      und(e) = math.max(und.getOrElse(e, -2.0), c)
    val w = und.map { case ((a, b), c) => (a, b) -> (1000000L - math.round(c * 1e6)) }
    var dist = emb.keys.filter(_ < AnalyticsQueries.SsspSources)
      .map(v => v -> (0L, 0L)).toMap
    for (_ <- 1 to AnalyticsQueries.SsspHops) {
      val relaxed = w.toSeq.flatMap { case ((a, b), wt) =>
        dist.get(a).map { case (dv, h) => b -> (dv + wt, h + 1L) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, cands) => v -> cands.map(_._2).min }
    }
    dist
  }

  test("sssp equals the independent Bellman-Ford on random corpora") {
    Seq(7L, 21L).foreach { seed =>
      val (dir, emb) = fixture(seed, 160)
      val got = AnalyticsQueries.queries("graph_sssp")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === refSssp(emb), s"sssp diverged from driver recompute, seed $seed")
    }
  }

  test("seed nodes sit at distance 0 hop 0; everything else costs hops and micros") {
    val (dir, _) = fixture(3L, 120)
    val rows = AnalyticsQueries.queries("graph_sssp")(spark, dir).collect()
    val (seeds, rest) = rows.partition(_.getLong(0) < AnalyticsQueries.SsspSources)
    assert(seeds.length == AnalyticsQueries.SsspSources.toInt)
    seeds.foreach(r => assert(r.getLong(1) == 0L && r.getLong(2) == 0L))
    rest.foreach { r =>
      assert(r.getLong(1) > 0L, s"non-seed at zero distance: $r")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= AnalyticsQueries.SsspHops.toLong)
    }
  }

  /** Independent BFS with path counting over the recomputed edges —
    * graph_path_counts' (dist, σ) per node under the same seed set. */
  private def refSigma(emb: Map[Long, Array[Double]]): Map[Long, (Long, Long)] = {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((s, ds) <- GraphTestUtil.annEdgesCos(emb); (t, _) <- ds) {
      adj(s) += t; adj(t) += s
    }
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    val sigma = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var frontier = emb.keys.filter(_ < AnalyticsQueries.SsspSources).toSet
    frontier.foreach { v => dist(v) = 0L; sigma(v) = 1L }
    for (h <- 1 to AnalyticsQueries.SsspHops) {
      val next = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (u <- frontier; v <- adj(u) if !dist.contains(v)) next(v) += sigma(u)
      next.foreach { case (v, s0) => dist(v) = h.toLong; sigma(v) = s0 }
      frontier = next.keySet.toSet
    }
    dist.keys.map(v => v -> (dist(v), sigma(v))).toMap
  }

  test("path counts equal the independent BFS-sigma on random corpora") {
    Seq(5L, 13L).foreach { seed =>
      val (dir, emb) = fixture(seed, 150)
      val got = AnalyticsQueries.queries("graph_path_counts")(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === refSigma(emb), s"sigma diverged from BFS recompute, seed $seed")
      // consistency with sssp: same seed set, so the reached sets agree
      // on hop-reachability (weighted dist differs, reachability doesn't)
      val sssp = AnalyticsQueries.queries("graph_sssp")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      assert(got.keySet === sssp, "sssp and path_counts must reach the same nodes")
    }
  }

  test("edge table carries the rounded cosine the weights are derived from") {
    val (dir, emb) = fixture(11L, 100)
    val edges = AnalyticsQueries.sharedAnnEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = GraphTestUtil.annEdgesCos(emb)
      .flatMap { case (s, ds) => ds.map { case (d, c) => (s, d) -> c } }
    assert(edges === want, "materialized (src, dst, cos) diverged from recompute")
  }
}
