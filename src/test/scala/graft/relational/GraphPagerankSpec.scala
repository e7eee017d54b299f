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
}
