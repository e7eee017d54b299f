package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** graph_pagerank: the probability-mass invariant, convergence toward the
  * degree structure, and a hand-checkable ring graph — the properties the
  * value-hash oracle can't explain if they break. */
class GraphPagerankSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("pagerank mass sums to 1 and every rank is positive") {
    val rows = AnalyticsQueries.queries("graph_pagerank")(spark, sf).collect()
    assert(rows.length === 500)
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass drifted from 1")
    assert(rows.forall(_.getDouble(1) > 0), "teleport term keeps every rank positive")
    // the distribution is non-degenerate: in-degree differences separate ranks
    assert(rows.map(_.getDouble(1)).distinct.length > 10)
  }

  test("ANN edge build: no cartesian product or broadcast nested loop anywhere in the plan") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // checkpoint=false keeps the raw lineage so the assertion sees the
    // candidate-generation joins (localCheckpoint would truncate them)
    val plan = AnalyticsQueries.annKnnEdges(emb, checkpoint = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucketed candidates must equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketed candidates must equi-join")
  }

  test("graph_knn_recall: bucketed edges keep >=80% of the exact top-k (floor)") {
    val rows = AnalyticsQueries.queries("graph_knn_recall")(spark, sf).collect()
    assert(rows.length === 32, "one row per probe node")
    val recalls = rows.map(_.getDouble(3))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"mean ANN recall $mean below floor 0.8")
    assert(recalls.min >= 0.3, s"worst-node recall ${recalls.min} below 0.3")
  }

  test("uniform ring graph has the exactly uniform stationary distribution") {
    // 8 nodes in a directed ring, k=1: every PageRank update preserves
    // uniformity regardless of damping, so r_i = 1/8 at every iteration
    import org.apache.spark.sql.functions._
    val n = 8
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    var rank = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to 10) {
      val contrib = rank.join(edges, rank("vec_id") === edges("src"))
        .groupBy(col("dst")).agg(sum(col("r") / 1).as("c"))
      rank = nodes.join(contrib, nodes("vec_id") === contrib("dst"), "left")
        .select(nodes("vec_id"),
          (lit(0.15 / n) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("r"))
    }
    rank.collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / n) < 1e-12))
  }

  test("clustering coefficient agrees with graph_triangles and its own formula") {
    // cross-query consistency: the coefficient query's n_triangles column
    // must equal the independently registered graph_triangles output
    // node-for-node, and coeff_micros must be exactly the integer-micro
    // formula over its own (degree, n_triangles) columns — bounded by 1e6
    val cc = AnalyticsQueries.queries("graph_clustering_coeff")(spark, sf).collect()
    val tri = AnalyticsQueries.queries("graph_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.length === 500)
    cc.foreach { r =>
      val (id, deg, t, cm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tri(id) == t, s"node $id: triangles $t != graph_triangles ${tri(id)}")
      val want = if (deg >= 2) (2000000L * t) / (deg * (deg - 1)) else 0L
      assert(cm == want, s"node $id: coeff_micros $cm != formula $want")
      assert(cm >= 0L && cm <= 1000000L, s"node $id: coefficient out of [0,1]: $cm")
    }
    // non-degenerate fixture: some tight-cluster nodes, some periphery
    assert(cc.exists(_.getLong(3) > 0L) && cc.exists(_.getLong(3) == 0L))
  }

  test("edge overlap: common-neighbor mass equals 3x the triangle count; J in [0,1)") {
    // every triangle {x,y,z} contributes exactly one common neighbor to
    // each of its three edges, so Σ_edges cn = 3·Σ_nodes T(v)/3·3 = 3·T —
    // a cross-query conservation law between graph_edge_overlap and
    // graph_triangles that a wedge-join or restriction bug breaks
    val eo = AnalyticsQueries.queries("graph_edge_overlap")(spark, sf).collect()
    val triTotal = AnalyticsQueries.queries("graph_triangles")(spark, sf).collect()
      .map(_.getLong(1)).sum / 3 // per-node counts triple-count each triangle
    val cnSum = eo.map(_.getLong(2)).sum
    assert(cnSum == 3 * triTotal, s"sum(cn)=$cnSum != 3*triangles=${3 * triTotal}")
    eo.foreach { r =>
      val (cn, da, db, jm) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // endpoints neighbor each other but never themselves: union >= cn + 2
      assert(jm == (1000000L * cn) / (da + db - cn) && jm >= 0L && jm < 1000000L,
        s"edge (${r.getLong(0)},${r.getLong(1)}): bad jaccard_micros $jm")
    }
    assert(eo.exists(_.getLong(2) > 0L), "fixture must have embedded edges")
  }

  test("hard negatives carry a different label, descend in cosine, and cap at k") {
    val labels = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val hn = AnalyticsQueries.queries("sample_hard_negatives")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(hn.nonEmpty)
    hn.foreach { case (a, n, _, _) =>
      assert(labels(a) != labels(n), s"negative $n shares anchor $a's label")
    }
    hn.groupBy(_._1).foreach { case (a, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length).toSeq, s"ranks not dense for $a")
      assert(byRank.length <= 3, s"anchor $a exceeds HardNegK")
      // cosine non-increasing with rank (ties broken by id, so >= holds)
      byRank.sliding(2).foreach {
        case Array(x, y) => assert(x._3 >= y._3, s"anchor $a: cosine rose with rank")
        case _ =>
      }
    }
  }

  test("graph_kcore: mutual 2-core keeps tight clusters, peels one-way satellites") {
    // two tight 4-point clusters: each point's top-3 are its cluster-mates
    // (all reciprocated → mutual degree 3, survives the 2-core); two
    // satellites whose nearest neighbors are not reciprocated by the
    // clusters peel away in round one whether or not their own mutual
    // edge forms. Fixture float32-quantized like the physical encoding.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kcore").toString
    val rnd = new scala.util.Random(29L)
    def cluster(axis: Int): Array[Float] = Array.tabulate(8)(j =>
      (if (j == axis) 1.0f else 0.0f) + rnd.nextGaussian().toFloat * 0.01f)
    val rows =
      (0 until 4).map(i => (i.toLong, cluster(0), 0)) ++
        (4 until 8).map(i => (i.toLong, cluster(1), 1)) ++
        Seq((8L, Array.tabulate(8)(j => if (j == 2) 1.0f else 0.0f), 2),
          (9L, Array.tabulate(8)(j =>
            if (j == 2) 0.9f else if (j == 3) 0.45f else 0.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = AnalyticsQueries.queries("graph_kcore")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3)))).toMap
    (0L to 7L).foreach { id =>
      assert(out(id) == ((true, 3L, true)), s"cluster node $id: ${out(id)}")
    }
    Seq(8L, 9L).foreach { id =>
      assert(!out(id)._1 && out(id)._2 == 0L, s"satellite $id must peel: ${out(id)}")
    }
  }

  test("graph_kcore invariants on the real fixture: converged, discriminating, degree-consistent") {
    val rows = AnalyticsQueries.queries("graph_kcore")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length === 500)
    assert(rows.forall(_._4), "KcoreRounds must reach the fixpoint at sf0.001")
    val members = rows.filter(_._2)
    assert(members.nonEmpty && members.length < rows.length,
      s"2-core must be discriminating, got ${members.length}/${rows.length}")
    members.foreach { case (id, _, cd, _) =>
      assert(cd >= AnalyticsQueries.KcoreK, s"converged member $id has core degree $cd")
    }
    rows.filterNot(_._2).foreach { case (id, _, cd, _) =>
      assert(cd == 0L, s"non-member $id must report core degree 0, got $cd")
    }
  }

  test("assortativity: two separated label clusters score exactly r_micros = 1e6") {
    // label-0 vectors near +e1, label-1 near -e1: every k-NN edge stays
    // inside its cluster, so e_same = m and Newman's r is exactly 1 —
    // (1e6*(m^2 - S)) div (m^2 - S) = 1000000 with zero tolerance.
    // Fixture float32-quantized like the physical encoding.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assort").toString
    val rnd = new scala.util.Random(17L)
    (0 until 40).map { i =>
      val sign = if (i < 20) 1.0f else -1.0f
      val v = Array.tabulate(8)(j =>
        (if (j == 0) sign else rnd.nextGaussian().toFloat * 0.01f))
      (i.toLong, v, if (i < 20) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val row = AnalyticsQueries.queries("graph_assortativity")(spark, dir).collect().head
    assert(row.getLong(1) == row.getLong(0), "all edges must be same-label")
    assert(row.getLong(3) == 1000000L, s"perfectly mixed clusters must give r=1e6: $row")
    // and the real fixture's r sits strictly inside (-1e6, 1e6)
    val real = AnalyticsQueries.queries("graph_assortativity")(spark, sf).collect().head
    assert(math.abs(real.getLong(3)) < 1000000L)
  }
}
