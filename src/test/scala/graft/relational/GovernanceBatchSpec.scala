package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Governance/composition batch: temperature-rescaled language mixing,
  * the mergeable-HLL-sketch contract, and the freshness SLA audit. Specs
  * pin the statistical contracts the DuckDB value hash can't see (the
  * rebalancing DIRECTION, the sketch-vs-exact relationship, lag/flag
  * consistency). */
class GovernanceBatchSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sample_temperature: head-lang share shrinks vs corpus share, tail grows; quotas honored") {
    val rows = AnalyticsQueries.queries("sample_temperature")(spark, sf).collect()
    assert(rows.nonEmpty)
    // (lang, n_docs, quota, rank, doc_id)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, rs) =>
      val quota = rs.head.getLong(2)
      assert(rs.length <= quota, "sampled rows must not exceed the quota")
      val ranks = rs.map(_.getLong(3)).sorted
      assert(ranks.head == 1L && ranks.last == ranks.length,
        "ranks are contiguous from 1 — the selection is a prefix of the hash order")
    }
    val nDocs = byLang.view.mapValues(_.head.getLong(1)).toMap
    val quotas = byLang.view.mapValues(_.head.getLong(2)).toMap
    val corpusTotal = nDocs.values.sum.toDouble
    val quotaTotal = quotas.values.sum.toDouble
    val head = nDocs.maxBy(_._2)._1
    // α=0.5 flattens: the most frequent language's share of the mix must be
    // strictly below its share of the corpus, every tail language's at/above
    assert(quotas(head) / quotaTotal < nDocs(head) / corpusTotal)
    (nDocs.keySet - head).foreach { l =>
      assert(quotas(l) / quotaTotal >= nDocs(l) / corpusTotal,
        s"tail language $l must not lose share under temperature rescaling")
    }
    // determinism: content-addressed selection — second run is identical
    val again = AnalyticsQueries.queries("sample_temperature")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("agg_sketch_merge: union-of-partials equals whole sketch and tracks the exact count") {
    val rows = AnalyticsQueries.queries("agg_sketch_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"merge != whole for ${r.getString(0)} — associativity broken")
      assert(r.getBoolean(3), s"estimate off >5% for ${r.getString(0)}")
      assert(r.getLong(1) > 0)
    }
  }

  test("reshape_unpivot: each metric's melt is the exact multiset of its source column") {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture,
    // so the inverse is checked as per-metric multiset identity rather
    // than a pivot-back (which would collapse duplicate keys)
    val long = AnalyticsQueries.queries("reshape_unpivot")(spark, sf)
    val src = Tables.tbl(spark, sf, "lineitem")
    val metrics = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    assert(long.count() === src.count() * metrics.length)
    metrics.foreach { m =>
      val got = long.filter(col("metric") === m)
        .select(col("l_orderkey"), col("l_linenumber"), col("value"))
      val want = src.select(col("l_orderkey"), col("l_linenumber"), col(m).as("value"))
      assert(got.exceptAll(want).count() === 0L, s"$m: extra rows in the melt")
      assert(want.exceptAll(got).count() === 0L, s"$m: rows lost in the melt")
    }
  }

  test("reshape_transpose: cells equal the tall stats frame at transposed coordinates") {
    val wide = AnalyticsQueries.queries("reshape_transpose")(spark, sf).collect()
    val stats = Tables.tbl(spark, sf, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"), round(avg(col("value")), 6).as("avg_value"),
        round(min(col("value")), 6).as("min_value"), round(max(col("value")), 6).as("max_value"))
      .collect().map(r => r.getString(0) -> r).toMap
    val header = AnalyticsQueries.queries("reshape_transpose")(spark, sf).columns
    assert(header.head === "key" && header.tail.sorted.toSeq === stats.keySet.toSeq.sorted)
    wide.foreach { row =>
      val stat = row.getString(0)
      header.tail.zipWithIndex.foreach { case (tpe, i) =>
        val want = stats(tpe).getAs[Double](stat)
        assert(row.getDouble(i + 1) === want, s"cell ($stat, $tpe)")
      }
    }
  }

  test("variant ingestion: schema fingerprints detect producer drift; missing paths are null") {
    import spark.implicits._
    val df = Seq("""{"k": 1}""", """{"k": 2, "extra": "x"}""", """{"k": 3}""")
      .toDF("props").selectExpr("parse_json(props) as v")
    // a producer adding a field changes the fingerprint, not the pipeline
    assert(df.selectExpr("schema_of_variant(v) as s").distinct().count() === 2L)
    // query-time type binding: present path binds, absent path is null
    val r = df.selectExpr("variant_get(v, '$.k', 'bigint') as k",
      "variant_get(v, '$.missing', 'bigint') as m").collect()
    assert(r.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(r.forall(_.isNullAt(1)))
  }

  test("map_cast_int8's wrap expression equals two's-complement narrowing (numpy astype)") {
    import spark.implicits._
    // the sf0.1 sweep caught a bare ANSI tinyint cast overflowing at 130;
    // the explicit wrap must equal JVM .toByte (== numpy int8) everywhere
    val xs = Seq(-400L, -130L, -129L, -128L, -1L, 0L, 1L, 127L, 128L, 130L, 255L, 256L, 300L)
    val got = xs.toDF("x")
      .select(expr("cast(((x % 256) + 384) % 256 - 128 as tinyint)").as("b"))
      .collect().map(_.getByte(0))
    assert(got.toSeq === xs.map(_.toByte))
  }

  test("dq_freshness: the freshest type lags 0; stale flag consistent with the 60-min lag") {
    val rows = QualityQueries.queries("dq_freshness")(spark, sf).collect()
    assert(rows.nonEmpty)
    // (event_type, n_events, last_ts_us, lag_min, stale)
    assert(rows.count(_.getLong(3) == 0L) >= 1, "some type carries the feed max")
    val feedMax = rows.map(_.getLong(2)).max
    rows.foreach { r =>
      val lagUs = feedMax - r.getLong(2)
      assert(r.getLong(3) === lagUs / 60000000L)
      assert(r.getBoolean(4) === (lagUs > 3600000000L))
    }
  }
}
