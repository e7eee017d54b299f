package graft

import graft.core.{Llk, Pfsa}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface must resolve through `spark.sql.extensions` alone and
  * plan the SAME native expressions as the Scala API — pure SQL in, the
  * codegen'd kernel out, scores bit-exact against the driver kernel. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("plain SQL scores through the injected kernel functions, bit-exactly") {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // NOTE: the conf route (`spark.sql.extensions=graft.GraftExtensions`)
    // is STATIC — read from the SparkContext at ITS creation — so a spec
    // sharing the suite's context must inject programmatically; a real
    // deployment sets the conf on spark-submit and gets the same effect
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      import s.implicits._
      val lib = Seq(Pfsa.m2, Pfsa.m2u)
      val seqs = Seq(0L -> Pfsa.m2.sample(500, 1L), 1L -> Pfsa.m2u.sample(500, 2L))
      val want = seqs.map { case (sid, syms) =>
        sid -> lib.map(m => Llk.llk(syms, m))
      }.toMap
      val models = lib.map(m => s"'${m.toText}'").mkString(", ")

      // array form
      seqs.map { case (sid, syms) => (sid, syms.toSeq) }
        .toDF("seq_id", "symbols").createOrReplaceTempView("graft_ext_seqs")
      val arr = s.sql(
        s"SELECT seq_id, graft_llk_score(symbols, $models) AS llks " +
          "FROM graft_ext_seqs ORDER BY seq_id")
      // analyzed, not executed: ConvertToLocalRelation folds the local
      // fixture through the expression at optimization time (which is
      // itself proof the INTERPRETED path agrees); codegen participation
      // is pinned in LlkScoreAllSpec over a real scan
      assert(arr.queryExecution.analyzed.toString.contains("llk_score_all"),
        "SQL route did not resolve to the native expression")
      arr.collect().foreach { r =>
        assert(r.getSeq[Double](1) == want(r.getLong(0)),
          s"seq ${r.getLong(0)} diverged via SQL")
      }

      // long form, as a SQL aggregate
      seqs.flatMap { case (sid, syms) =>
        syms.zipWithIndex.map { case (sym, t) => (sid, t.toLong, sym) }
      }.toDF("seq_id", "t", "symbol").createOrReplaceTempView("graft_ext_long")
      // DISTRIBUTE BY / SORT BY is the SQL spelling of the presorted plan
      // (one in-order head run per sequence -> bit-exact); without it the
      // aggregate still agrees to 1e-9 via matrix-run merging, as the
      // LlkLongScoreSpec scattered case pins
      val lng = s.sql(
        s"""SELECT seq_id, graft_llk_score_long(t, symbol, $models) AS llks
           |FROM (SELECT * FROM graft_ext_long DISTRIBUTE BY seq_id
           |      SORT BY seq_id, t)
           |GROUP BY seq_id ORDER BY seq_id""".stripMargin)
      lng.collect().foreach { r =>
        assert(r.getSeq[Double](1) == want(r.getLong(0)),
          s"seq ${r.getLong(0)} diverged via the SQL aggregate")
      }

      // the bounded top-k aggregate from SQL
      Seq(("a", 3.0, 1L), ("a", 5.0, 2L), ("a", 4.0, 3L), ("b", 1.0, 4L))
        .toDF("key", "value", "id").createOrReplaceTempView("graft_ext_topk")
      val tk = s.sql(
        """SELECT key, e.value, e.id
          |FROM (SELECT key, graft_top_k_rows(2, value, id) AS tk
          |      FROM graft_ext_topk GROUP BY key)
          |LATERAL VIEW explode(tk) AS e
          |ORDER BY key, e.value DESC""".stripMargin).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      assert(tk.toSeq == Seq(("a", 5.0, 2L), ("a", 4.0, 3L), ("b", 1.0, 4L)),
        s"SQL top-k diverged: ${tk.toSeq}")

      // misuse fails at analysis, not at runtime on an executor
      val ex = intercept[Throwable] {
        s.sql("SELECT graft_llk_score(symbols, seq_id) FROM graft_ext_seqs").collect()
      }
      assert(Option(ex.getMessage).exists(_.contains("literal")), ex.getMessage)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
