package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SURVEY §2.10 driver-compare hash-surface contract.
  *
  * Round 8 lost 3 of 192 gate rows to one failure class: output/oracle
  * columns whose DuckDB→pandas round-trip mangles types (HUGEINT→float64,
  * list→unsortable). These tests make the class a compile-and-test-time
  * failure instead of a CORRECTNESS_r{N} surprise — they fail on planted
  * violations AND sweep the full registered oracle surface.
  */
class DriverCompatLintSpec extends AnyFunSuite {

  // ------------------------------------------------- planted: output schema
  test("complexCols flags a planted array output column") {
    val s = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("q", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", StructType(Seq(StructField("a", IntegerType))))))
    val flagged = OracleLint.complexCols(s)
    assert(flagged.size === 3)
    assert(flagged.exists(_.startsWith("q:")), "array column must be flagged")
  }

  test("complexCols accepts a scalar-only schema") {
    val s = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType),
      StructField("name", StringType), StructField("ok", BooleanType),
      StructField("ts", TimestampType)))
    assert(OracleLint.complexCols(s).isEmpty)
  }

  // --------------------------------------------------- planted: oracle SQL
  test("hugeintRisks flags a planted uncast windowed sum") {
    val bad = "SELECT user_id, sum(n) OVER (PARTITION BY user_id ORDER BY ts) AS s FROM t"
    assert(OracleLint.hugeintRisks(bad).nonEmpty, "sum() OVER types HUGEINT in DuckDB")
  }

  test("hugeintRisks flags a planted uncast windowed sum with integer offset") {
    // round 8's join_interval_overlap shape: `- 1` keeps HUGEINT
    val bad = "SELECT sum(new_s) OVER (PARTITION BY u ORDER BY ts) - 1 AS session_idx FROM g"
    assert(OracleLint.hugeintRisks(bad).nonEmpty)
  }

  test("hugeintRisks flags a planted uncast list_sum") {
    // round 8's sort_zorder shape
    val bad = "SELECT list_sum(list_transform(range(0,16), i -> i)) AS z FROM e ORDER BY z"
    assert(OracleLint.hugeintRisks(bad).nonEmpty)
  }

  test("hugeintRisks accepts CAST-wrapped forms") {
    val ok = Seq(
      "SELECT CAST(sum(n) OVER (PARTITION BY u) AS BIGINT) AS s FROM t",
      "SELECT CAST(sum(new_s) OVER (ORDER BY ts) - 1 AS BIGINT) AS idx FROM g",
      "SELECT CAST(list_sum(l) AS BIGINT) AS z FROM e",
      "SELECT CAST(sum(dev) OVER w AS BIGINT) AS cusum FROM t WINDOW w AS (ORDER BY ts)")
    ok.foreach(sql => assert(OracleLint.hugeintRisks(sql).isEmpty, sql))
  }

  test("hugeintRisks accepts ratio consumption (division types DOUBLE)") {
    val ok = Seq(
      "SELECT round(n / sum(n) OVER (PARTITION BY t), 6) AS share FROM c",
      "SELECT n * 1.0 / sum(n) OVER (PARTITION BY s) AS frac FROM c",
      "SELECT round(list_sum(errs) / len(emb), 6) AS err FROM e")
    ok.foreach(sql => assert(OracleLint.hugeintRisks(sql).isEmpty, sql))
  }

  test("hugeintRisks accepts CTE alias later cast or divided") {
    val ok = Seq(
      // agg_mode shape: alias cast at projection
      """WITH r AS (SELECT u, sum(n) OVER (PARTITION BY u) AS total FROM c)
        |SELECT u, CAST(total AS BIGINT) AS n_total FROM r""".stripMargin,
      // ts_peak_hours shape: alias consumed as a divisor
      """WITH r AS (SELECT u, sum(n) OVER (PARTITION BY u) AS total FROM c)
        |SELECT u, round(CAST(n AS DOUBLE) / total, 6) AS share FROM r""".stripMargin)
    ok.foreach(sql => assert(OracleLint.hugeintRisks(sql).isEmpty, sql))
  }

  test("hugeintRisks ignores plain (non-windowed) sums") {
    assert(OracleLint.hugeintRisks(
      "SELECT k, sum(x) AS s FROM t GROUP BY k").isEmpty,
      "plain aggregate sums are the DESCRIBE lint's scope, not this one's")
  }

  // --------------------------------------- full registered oracle surface
  test("no registered oracle carries an uncast HUGEINT windowed/list sum") {
    val hits = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      OracleLint.hugeintRisks(sql).map(r => s"$name: $r")
    }
    assert(hits.isEmpty, s"driver-unportable oracles:\n${hits.mkString("\n")}")
  }
}
