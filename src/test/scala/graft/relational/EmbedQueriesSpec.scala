package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-statistics wave (EmbedQueries + the CovMatrix aggregate).
  * Oracle parity runs at the gate; these specs pin the algebra: the
  * single-pass covariance against a two-pass driver recompute, its
  * partitioning-independence (the mergeable-state property), centroid
  * mass balance, and nearest-centroid argmin correctness against an
  * independent scorer.
  */
class EmbedQueriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = EmbedQueries.queries(name)(spark, sf)

  private def vectors: Array[(Long, Array[Double], Int)] =
    Tables.embeddings(spark, sf).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))
    }

  // ---------------------------------------------------------- covariance
  test("agg_covariance matches a two-pass driver recompute within rounding") {
    val rows = q("agg_covariance").collect()
    val vs = vectors.map(_._2)
    val d = vs.head.length
    assert(rows.length === d * (d + 1) / 2)
    val n = vs.length.toDouble
    val mean = Array.tabulate(d)(i => vs.map(_(i)).sum / n)
    def covTwoPass(i: Int, j: Int): Double =
      vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1.0)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      assert(i <= j, "upper triangle only")
      // one-pass algebraic identity vs two-pass centered recompute: equal
      // far below the 6-dp rounding on this data
      assert(math.abs(r.getDouble(2) - covTwoPass(i, j)) < 1e-6,
        s"cov($i,$j): ${r.getDouble(2)} vs ${covTwoPass(i, j)}")
      if (i == j) assert(r.getDouble(2) >= 0.0, s"variance at dim $i is non-negative")
    }
  }

  test("CovMatrix is partitioning-independent: 1-partition and 7-partition runs agree") {
    val emb = Tables.embeddings(spark, sf)
    def run(parts: Int) = {
      import org.apache.spark.sql.graft.ColumnBridge
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      val agg = ColumnBridge.column(graft.functions.CovMatrix(dim,
        ColumnBridge.expression(col("embedding"))).toAggregateExpression())
      emb.repartition(parts).agg(agg.as("cm"))
        .select(explode(col("cm")).as("e"))
        .select(col("e.i"), col("e.j"), round(col("e.cov"), 9).as("c"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    }
    val a = run(1); val b = run(7)
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) < 1e-9, s"merge must be order-insensitive at $k")
    }
  }

  test("CovMatrix skips nulls and wrong-length vectors") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val df = Seq(
      Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 5.0)),
      Some(Seq(9.0)), // wrong length: skipped
      Some(Seq(5.0, 8.0))).toDF("v")
    val agg = ColumnBridge.column(graft.functions.CovMatrix(2,
      ColumnBridge.expression(col("v"))).toAggregateExpression())
    val out = df.agg(agg.as("cm")).select(explode(col("cm")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.cov"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // three valid rows: (1,2),(3,5),(5,8) -> var x = 4, var y = 9, cov = 6
    assert(math.abs(out((0, 0)) - 4.0) < 1e-12)
    assert(math.abs(out((1, 1)) - 9.0) < 1e-12)
    assert(math.abs(out((0, 1)) - 6.0) < 1e-12)
  }

  // ----------------------------------------------------------- centroids
  test("embed_centroids: mass balance and per-dimension mean bounds") {
    val rows = q("embed_centroids").collect()
    val vs = vectors
    val d = vs.head._2.length
    val labels = vs.map(_._3).distinct
    assert(rows.length === labels.length * d)
    rows.groupBy(_.getInt(0)).foreach { case (label, rs) =>
      val members = vs.filter(_._3 == label)
      assert(rs.forall(_.getLong(2) === members.length.toLong), s"label $label: n = |members|")
      rs.foreach { r =>
        val i = r.getLong(1).toInt
        val xs = members.map(_._2(i))
        assert(r.getDouble(3) >= xs.min - 1e-6 && r.getDouble(3) <= xs.max + 1e-6,
          s"label $label dim $i: mean within member range")
      }
    }
  }

  // ----------------------------------------------- nearest centroid argmin
  test("embed_nearest_centroid: assignment minimizes distance to the rounded centroids") {
    val rows = q("embed_nearest_centroid").collect()
    val vs = vectors
    assert(rows.length === vs.length)
    val d = vs.head._2.length
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cent = vs.groupBy(_._3).map { case (l, ms) =>
      l -> Array.tabulate(d)(i => r6(ms.map(_._2(i)).sum / ms.length))
    }
    val byId = vs.map(v => v._1 -> v).toMap
    rows.foreach { r =>
      val x = byId(r.getLong(0))._2
      val dists = cent.map { case (l, c) =>
        l -> r6(x.indices.map(i => (x(i) - c(i)) * (x(i) - c(i))).sum)
      }
      val (bestL, bestD) = dists.toSeq.minBy { case (l, dd) => (dd, l) }
      assert(r.getInt(2) === bestL, s"vec ${r.getLong(0)}: argmin label")
      assert(math.abs(r.getDouble(3) - bestD) < 1e-6, s"vec ${r.getLong(0)}: argmin distance")
      assert(r.getBoolean(4) === (r.getInt(1) == bestL))
    }
  }

  test("embed_nearest_centroid plan: centroids broadcast, no corpus-sized shuffle join") {
    val plan = q("embed_nearest_centroid").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroid frame must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join of the corpus:\n$plan")
  }
}
