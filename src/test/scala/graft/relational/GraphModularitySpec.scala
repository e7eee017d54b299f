package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** graph_modularity / graph_conductance: a full independent pure-Scala
  * recompute (GraphTestUtil edges → label-prop rounds → the pinned
  * integer-micro Q and φ formulas) on a mixed three-group fixture, plus
  * the conservation laws the value-hash oracle can't explain if they
  * break (Σ deg_sum = 2m, vol = 2·e_in + cut per community, q_total =
  * Σ q_term). */
class GraphModularitySpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Pure-Scala label propagation: LpIters rounds, majority vote over the
    * undirected adjacency, ties to the smallest label, isolated nodes
    * keep their own — the third implementation beside the Catalyst loop
    * and the unrolled DuckDB chain. */
  private def lpLabels(emb: Map[Long, Array[Double]],
                       seed: Map[Long, Long]): Map[Long, Long] = {
    val dirEdges = GraphTestUtil.annEdges(emb, 3)
    val und = dirEdges.toSeq.flatMap { case (s, ds) => ds.map(d => (math.min(s, d), math.max(s, d))) }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = seed
    for (_ <- 1 to AnalyticsQueries.LpIters) {
      labels = labels.map { case (v, own) =>
        adj.get(v) match {
          case Some(nbrs) if nbrs.nonEmpty =>
            val counts = nbrs.groupBy(labels).view.mapValues(_.size).toSeq
            v -> counts.minBy { case (l, c) => (-c, l) }._1
          case _ => v -> own
        }
      }
    }
    labels
  }

  private def fixture(dir: String): Map[Long, Array[Double]] = {
    val rnd = new scala.util.Random(41L)
    def pt(ax0: Double, ax1: Double): Array[Float] = Array.tabulate(8) { j =>
      val base = if (j == 0) ax0 else if (j == 1) ax1 else 0.0
      (base + rnd.nextGaussian() * 0.02).toFloat
    }
    // two tight clusters + a bridge group angled between them with mixed
    // labels: cross-community edges exist, so Q < 1 and φ > 0 somewhere
    val rows =
      (0 until 8).map(i => (i.toLong, pt(1.0, 0.0), 0)) ++
        (8 until 16).map(i => (i.toLong, pt(0.0, 1.0), 1)) ++
        (16 until 20).map(i => (i.toLong, pt(0.72, 0.72), if (i % 2 == 0) 0 else 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // the reference copy goes through float32 exactly like the parquet
    // column (the round-10 ulp rule)
    rows.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
  }

  test("modularity and conductance match a full pure-Scala recompute on a mixed fixture") {
    val dir = java.nio.file.Files.createTempDirectory("modularity").toString
    val emb = fixture(dir)
    val seed = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val labels = lpLabels(emb, seed)

    val dirEdges = GraphTestUtil.annEdges(emb, 3)
    val und = dirEdges.toSeq.flatMap { case (s, ds) =>
      ds.map(d => (math.min(s, d), math.max(s, d)))
    }.distinct
    val m = und.size.toLong
    val communities = labels.values.toSeq.distinct.sorted
    val eIn = communities.map(c =>
      c -> und.count { case (a, b) => labels(a) == c && labels(b) == c }.toLong).toMap
    val degSum = communities.map(c =>
      c -> (und ++ und.map(_.swap)).count { case (a, _) => labels(a) == c }.toLong).toMap
    val cut = communities.map(c =>
      c -> (und ++ und.map(_.swap)).count { case (a, b) =>
        labels(a) == c && labels(b) != c }.toLong).toMap
    val nNodes = communities.map(c => c -> labels.values.count(_ == c).toLong).toMap
    // BigInt / truncates toward zero — the same T-division both engines pin
    def qTerm(c: Long): Long =
      (BigInt(1000000L) * (4 * m * eIn(c) - degSum(c) * degSum(c)) / (4 * m * m)).toLong
    val qTotal = communities.map(qTerm).sum

    val mod = AnalyticsQueries.queries("graph_modularity")(spark, dir).collect()
    assert(mod.map(_.getLong(0)).toSeq == communities, "community set mismatch")
    mod.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == nNodes(c), s"n_nodes($c)")
      assert(r.getLong(2) == eIn(c), s"e_in($c)")
      assert(r.getLong(3) == degSum(c), s"deg_sum($c)")
      assert(r.getLong(4) == m, "m")
      assert(r.getLong(5) == qTerm(c), s"q_term_micros($c)")
      assert(r.getLong(6) == qTotal, s"q_total_micros($c)")
    }
    // the bridge group guarantees at least one cross-community edge
    assert(mod.map(_.getLong(2)).sum < m, "fixture must have cross edges")

    val con = AnalyticsQueries.queries("graph_conductance")(spark, dir).collect()
    assert(con.map(_.getLong(0)).toSeq == communities)
    con.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(2) == degSum(c), s"vol($c)")
      assert(r.getLong(3) == cut(c), s"cut($c)")
      val denom = math.min(degSum(c), 2 * m - degSum(c))
      if (denom == 0) assert(r.isNullAt(5), s"phi($c) must be NULL at denom 0")
      else assert(r.getLong(5) == 1000000L * cut(c) / denom, s"phi_micros($c)")
    }
  }

  test("conservation laws hold on the real fixture and the two outputs agree") {
    val mod = AnalyticsQueries.queries("graph_modularity")(spark, sf).collect()
    val con = AnalyticsQueries.queries("graph_conductance")(spark, sf).collect()
    assert(mod.nonEmpty && mod.length == con.length)
    val m = mod.head.getLong(4)
    assert(mod.map(_.getLong(3)).sum == 2 * m, "Σ deg_sum must equal 2m")
    assert(mod.map(_.getLong(2)).sum <= m, "Σ e_in cannot exceed m")
    assert(mod.map(_.getLong(1)).sum == 500L, "every node belongs to one community")
    val qTotal = mod.head.getLong(6)
    assert(mod.forall(_.getLong(6) == qTotal), "q_total constant across rows")
    assert(mod.map(_.getLong(5)).sum == qTotal, "q_total = Σ q_term")
    assert(math.abs(qTotal) < 1000000L, "Q ∈ (−1, 1) strictly on the real fixture")
    val volByC = con.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cutByC = con.map(r => r.getLong(0) -> r.getLong(3)).toMap
    mod.foreach { r =>
      val c = r.getLong(0)
      assert(volByC(c) == r.getLong(3), s"conductance vol($c) = modularity deg_sum($c)")
      assert(volByC(c) == 2 * r.getLong(2) + cutByC(c), s"vol = 2·e_in + cut for $c")
    }
    con.filterNot(_.isNullAt(5)).foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L,
        s"phi_micros out of [0, 1e6]: ${r.getLong(5)}")
    }
  }
}
