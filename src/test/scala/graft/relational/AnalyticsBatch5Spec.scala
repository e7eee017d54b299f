package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-5 operators: domain-mixture sampling, weighted sampling,
  * raw-file (binaryFile) ingest. Specs pin the contracts beyond the
  * value hash: quota enforcement + determinism, weight monotonicity in
  * expectation, and byte-exact file round-trip. */
class AnalyticsBatch5Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("corpus_mix: per-source counts hit min(quota, available); re-run picks the same docs") {
    val rows = q("corpus_mix").collect()
    val avail = Tables.tbl(spark, sf, "documents").groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = AnalyticsQueries.MixQuotas.toMap
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val want = math.min(quotas.getOrElse(src, AnalyticsQueries.MixDefaultQuota), avail(src))
      assert(rs.length.toLong === want, s"source $src got ${rs.length}, want $want")
    }
    val again = q("corpus_mix").collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet, "content-addressed = repeatable")
  }

  test("sample_weighted: 50 ranked rows, and long docs are overrepresented vs uniform") {
    val rows = q("sample_weighted").collect()
    assert(rows.length === 50)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 50L))
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpusMean = Tables.tbl(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"length-weighted draw must skew long: sample $sampleMean vs corpus $corpusMean")
  }

  test("map_json_extract: bucket counts conserve the corpus; k bounds sit inside the bucket") {
    val rows = q("map_json_extract").collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total, "every row's payload parsed")
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(r.getLong(4) >= b * 10 && r.getLong(5) < (b + 1) * 10,
        s"k bounds outside bucket $b: ${r.getLong(4)}..${r.getLong(5)}")
    }
  }

  test("map_json_extract: malformed payloads surface as NULL and are filtered, not thrown") {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import spark.implicits._
    val bad = Seq("""{"k": 3}""", "not json", """{"k": "x"}""", null).toDF("props")
      .withColumn("k", from_json(col("props"), StructType(Seq(StructField("k", LongType))))("k"))
    val ks = bad.collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    assert(ks === Seq(Some(3L), None, None, None))
  }

  test("window_funnel: all three depths occur and step times are ordered within the window") {
    val rows = q("window_funnel").collect()
    val depths = rows.map(_.getLong(4)).toSet
    assert(depths.intersect(Set(1L, 2L, 3L)).size >= 2, s"funnel degenerate: $depths")
    rows.filter(_.getLong(4) == 3L).foreach { r =>
      val (t1, t2, t3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t1 <= t2 && t2 <= t3, "steps must be ordered")
      assert(t3 <= t1 + AnalyticsQueries.FunnelWindowUs, "completion inside the window")
    }
    assert(rows.filter(_.getLong(4) >= 2L).forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("text_gopher_rules: the word-count and stopword axes both split the fixture") {
    val rows = q("text_gopher_rules").collect()
    assert(rows.map(_.getBoolean(5)).toSet === Set(true, false), "pass verdict must vary")
    assert(rows.exists(_.getLong(3) == 0L) && rows.exists(_.getLong(3) > 0L),
      "stopword axis flat")
    assert(rows.forall(_.getDouble(4) == 0.0), "fixture text is symbol-free by construction")
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) < 20))
  }

  test("join_interval_overlap: bucket-scatter join equals the direct O(n^2) overlap join") {
    // sf0.01: sf0.001 has no qualifying incident, and the identity must be
    // checked where matches exist
    val big = "/root/testdata/sf0.01"
    val fast = AnalyticsQueries.queries("join_interval_overlap")(spark, big)
      .collect().map(_.toSeq).toSet
    assert(fast.nonEmpty, "threshold must select incidents at sf0.01")
    // direct recompute: every (session, incident) pair, no buckets
    val e = Tables.eventsTsUs(spark, big)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("ts_us"), 1).over(w)
    val sess = e
      .withColumn("new_s", when(prev.isNull || col("ts_us") - prev > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)) - 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_us")).as("s_start"), max(col("ts_us")).as("s_end"))
    val inc = e.filter(col("event_type") === "error" && col("value") > 200d)
      .select(col("event_id").as("incident_id"),
        (col("ts_us") - 3600000000L).as("i_start"), (col("ts_us") + 3600000000L).as("i_end"))
    val direct = sess.crossJoin(inc)
      .filter(col("s_start") <= col("i_end") && col("i_start") <= col("s_end"))
      .select(col("user_id"), col("session_idx"), col("incident_id"),
        (least(col("s_end"), col("i_end")) - greatest(col("s_start"), col("i_start")))
          .as("overlap_us"))
      .collect().map(_.toSeq).toSet
    assert(fast === direct)
    assert(fast.forall(_.last.asInstanceOf[Long] >= 0L), "overlap length is non-negative")
  }

  test("scan_binaryfile: every doc round-trips with exact byte length and md5") {
    val rows = q("scan_binaryfile").collect()
    val src = Tables.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"), md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.length === src.size)
    rows.foreach { r =>
      val (len, m) = src(r.getLong(0))
      assert(r.getLong(1) === len && r.getString(2) === m)
    }
  }
}
