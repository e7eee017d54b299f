package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity audit, deterministic reservoir sampling, and the SQL
  * surface of the round-8 kernels. Oracle parity runs at the gate; these
  * pin mass balance and the flag rule, reservoir determinism +
  * minimality against a driver recompute (and the no-rank-window plan),
  * and the graft_vec_dot / graft_cov_matrix SQL route.
  */
class WaveSevenSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // --------------------------------------------------------- k-anonymity
  test("dq_k_anonymity: groups partition the corpus; flag is n >= 5") {
    val rows = QualityQueries.queries("dq_k_anonymity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.tbl(spark, sf, "documents").count()
    assert(rows.map(_.getLong(3)).sum === total, "quasi-identifier groups partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(3) >= 1L)
      assert(r.getBoolean(4) === (r.getLong(3) >= 5L), "k=5 rule")
    }
  }

  // ----------------------------------------------------------- reservoir
  test("sample_reservoir: deterministic, minimal-hash selection, k per key") {
    val run1 = SearchQueries.queries("sample_reservoir")(spark, sf).collect()
    val run2 = SearchQueries.queries("sample_reservoir")(spark, sf).collect()
    assert(run1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      run2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq,
      "re-runs select identically")
    // driver recompute of the 4-hex-char priority
    def hv(id: Long): Int = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hx.take(4).foldLeft(0)((acc, c) => acc * 16 + (if (c >= 'a') c - 87 else c - 48))
    }
    val docs = Tables.tbl(spark, sf, "documents").select(col("lang"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val expect = ds.map(_._2).sortBy(id => (hv(id), id)).take(10)
      val got = run1.filter(_.getString(0) == lang).sortBy(_.getLong(1)).map(_.getLong(2))
      assert(got.toSeq === expect.toSeq, s"$lang: the k smallest hashes, in hash order")
      assert(got.length === math.min(10, ds.length))
    }
  }

  test("sample_reservoir plan: bounded aggregate, not a rank window") {
    val plan = SearchQueries.queries("sample_reservoir")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"reservoir must not sort whole keys:\n$plan")
    assert(plan.contains("top_k_rows") || plan.contains("ObjectHashAggregate"),
      s"expected the bounded TopKRows aggregate:\n$plan")
  }

  // ---------------------------------------------------------- SQL surface
  test("graft_vec_dot and graft_cov_matrix resolve and compute through plain SQL") {
    val base = graft.TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      val dot = s.sql(
        "SELECT graft_vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head.getDouble(0)
      assert(dot === 32.0)
      import s.implicits._
      Seq(Seq(1.0, 2.0), Seq(3.0, 5.0), Seq(5.0, 8.0)).toDF("v")
        .createOrReplaceTempView("wave7_vecs")
      val cov = s.sql(
        "SELECT e.i, e.j, e.cov FROM (SELECT explode(graft_cov_matrix(2, v)) AS e FROM wave7_vecs)")
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      assert(math.abs(cov((0, 0)) - 4.0) < 1e-12)
      assert(math.abs(cov((1, 1)) - 9.0) < 1e-12)
      assert(math.abs(cov((0, 1)) - 6.0) < 1e-12)
    } finally {
      s.catalog.dropTempView("wave7_vecs")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      base.sparkContext // keep the shared context alive for later suites
    }
  }
}
