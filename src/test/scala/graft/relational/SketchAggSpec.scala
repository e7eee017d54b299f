package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable-sketch aggregation family (agg_distinct_sketch,
  * agg_quantiles_approx): verdict grids must be all-true on the fixture,
  * and the underlying sketch contracts must hold on adversarial synthetic
  * inputs (many shards; tie swarms) — the cases the fixture may not hit. */
class SketchAggSpec extends AnyFunSuite {

  test("agg_sketch_intersection: all C(5,2) pairs, verdicts true, exact legs match a direct recompute") {
    import org.apache.spark.sql.functions._
    val spark0 = graft.TestSpark.spark
    val sf0 = "/root/testdata/sf0.001"
    val rows = RelationalQueries.queries("agg_sketch_intersection")(spark0, sf0).collect()
    assert(rows.length === 10, "5 event types -> 10 unordered pairs")
    assert(rows.forall(_.getBoolean(3)),
      "inclusion-exclusion estimate must land within tolerance on the fixture")
    val tu = Tables.events(spark0, sf0)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val expect = (byType(r.getString(0)) & byType(r.getString(1))).size.toLong
      assert(r.getLong(2) === expect, s"exact leg for ${r.getString(0)}/${r.getString(1)}")
    }
  }
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("agg_distinct_sketch: one row per type, verdict all-true, exact leg matches countDistinct") {
    val rows = RelationalQueries.queries("agg_distinct_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), s"sketch estimate out of tolerance: ${rows.mkString(",")}")
    val exact = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === exact(r.getString(0))))
  }

  test("HLL union of many shard sketches equals the single-pass estimate (mergeability)") {
    val ids = (1L to 5000L).toDF("id")
    val single = ids.agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12)))).head().getLong(0)
    val merged = ids.withColumn("shard", pmod(col("id"), lit(64)))
      .groupBy(col("shard")).agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))).head().getLong(0)
    // union is NOT bit-identical to one-pass (sparse→dense mode transitions
    // differ per accumulation order) — the contract is that both stay
    // inside the lgK=12 error envelope of the true cardinality and of
    // each other
    assert(math.abs(single - 5000L) <= 250L, s"one-pass estimate $single off >5% of 5000")
    assert(math.abs(merged - 5000L) <= 250L, s"merged estimate $merged off >5% of 5000")
    assert(math.abs(merged - single) <= 100L,
      s"union-of-shards $merged drifted >2% from one-pass $single")
  }

  test("agg_quantiles_approx: 3 probs per type, rank verdict all-true") {
    val rows = RelationalQueries.queries("agg_quantiles_approx")(spark, sf).collect()
    assert(rows.length % 3 === 0 && rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), s"rank contract broken: ${rows.mkString(",")}")
  }

  test("text_heavy_hitters: verdict all-true on the fixture, threshold respected") {
    val rows = graft.SparkEntry.queries("text_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      s"sketch missed a true heavy hitter: ${rows.filterNot(_.getBoolean(2)).mkString(",")}")
  }

  test("heavy-hitter sketch finds dominant tokens in a skewed synthetic corpus") {
    val dir = java.nio.file.Files.createTempDirectory("hh").toString
    // 'alpha'/'beta' at 30% each; 40 singleton junk tokens well below
    // support (letter-distinct: the [a-z]+ tokenizer strips digits, so a
    // numeric suffix would collapse them all into one heavy 'junk' token)
    val texts = Seq.fill(60)("alpha beta") ++ (0 until 40).map(i =>
      s"zz${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("text_heavy_hitters")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq.sorted
    assert(rows == Seq(("alpha", 60L, true), ("beta", 60L, true)),
      s"skewed-corpus heavy hitters wrong: $rows")
  }

  test("approx_percentile rank contract holds under a dominant tie block") {
    // 60% of values identical: the returned p50 element is inside the tie
    // swarm, where a point-rank check would false-fail but the rank
    // INTERVAL [count(<v)+1, count(<=v)] legitimately contains p·n
    val vals = (Seq.fill(600)(7.0) ++ (1 to 400).map(_.toDouble + 100.0)).toDF("value")
    val v = vals.agg(expr("approx_percentile(value, 0.5, 1000)")).head().getDouble(0)
    val (nLt, nLe) = (vals.filter(col("value") < v).count(), vals.filter(col("value") <= v).count())
    val (lo, hi) = ((0.5 - 0.001) * 1000, (0.5 + 0.001) * 1000)
    assert(nLt + 1 <= math.ceil(hi) && nLe >= math.floor(lo),
      s"rank interval [${nLt + 1}, $nLe] misses [$lo, $hi]")
  }
}
