package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** quality_classifier — the trained (MLlib logistic regression) quality
  * scorer (r13 verdict ask #6). The gate hash-checks the verdict grid;
  * these specs pin what the grid's booleans summarize: the decile
  * partition is complete and integer-exact over the scored universe, and
  * the verdict booleans hold with their margins on the fixture. */
class QualityClassifierSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("scoring survives a session whose Observation API has been exercised") {
    // Regression pin for the round-14 bench failure: MLlib's
    // `model.transform` UDF captures the MODEL, whose trainingSummary
    // holds the SparkSession — and serializing the session dies on any
    // lazily-initialized non-serializable session field. Running ANY
    // Observation-API query (observe_metrics) initializes
    // SparkSession.observationManager, after which a transform-based
    // classifier throws Task-not-serializable on its next action. The
    // fixed scorer is a native VecDotConst sigmoid over the fitted
    // coefficients (65 doubles as a codegen reference object) — this test
    // reproduces the poisoning order and must stay green.
    graft.SparkEntry.queries("observe_metrics")(spark, sf).count()
    val n = DataPipelineQueries.queries("quality_classifier")(spark, sf).count()
    assert(n === 10L)
  }

  test("verdict grid: 10 complete deciles over the token-bearing universe, all checks true") {
    val rows = DataPipelineQueries.queries("quality_classifier")(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).toSeq === (0L to 9L), "deciles 0..9, ordered")
    // the decile partition covers exactly the scored universe: docs with
    // at least one [a-z]+ token (empty docs have no feature row)
    val universe = Tables.tbl(spark, sf, "documents")
      .filter(size(graft.text.TextOps.tokens("text")) > 0).count()
    assert(rows.map(_.getLong(1)).sum === universe, "decile counts sum to the universe")
    // integer-exact decile sizes: ((rank-1)*10) div N over ranks 1..N
    val expected = (1L to universe).groupBy(r => (r - 1) * 10 / universe)
      .view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(r.getLong(1) === expected(r.getLong(0)),
      s"decile ${r.getLong(0)} size"))
    // the four verdict booleans (floors .75/.70 accuracy, .3 separation;
    // measured .93/.85/.98 here) all hold
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"verdict row failed: $r")
    }
  }
}
