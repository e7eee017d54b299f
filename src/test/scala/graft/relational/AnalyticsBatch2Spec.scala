package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-2 analytics operators: gap-fill resample, int8 embedding
  * quantization, count-min frequencies, bloom-pruned semi-join. The gate
  * oracles pin value parity; these specs pin the structural contracts —
  * grid completeness, code range + reconstruction bound, sketch
  * mergeability/no-underestimate, bloom no-false-negative identity. */
class AnalyticsBatch2Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("ts_resample: per-user grid is contiguous, starts non-gap, fill leaves no nulls") {
    val rows = q("ts_resample").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val buckets = rs.map(_.getLong(1)).sorted
      assert(buckets.zip(buckets.tail).forall { case (a, b) => b == a + 1 },
        "grid must be contiguous hours")
      val first = rs.minBy(_.getLong(1))
      assert(!first.getBoolean(4), "first bucket comes from a real event")
    }
    assert(rows.forall(!_.isNullAt(3)), "forward fill leaves no null values")
    // gap rows copy the previous value verbatim
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      rs.sortBy(_.getLong(1)).foldLeft(Option.empty[Double]) { (prev, r) =>
        if (r.getBoolean(4)) assert(prev.contains(r.getDouble(3)), "gap must copy previous v")
        Some(r.getDouble(3))
      }
    }
  }

  test("embed_quantize_int8: codes span [-127,127], max|code|=127, err bounded by scale/2") {
    val rows = q("embed_quantize_int8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getString(2).split(",").map(_.toInt).toSeq
      assert(q.forall(c => c >= -127 && c <= 127), "int8 symmetric range")
      assert(q.map(math.abs).max === 127, "scale chosen so the max element hits 127")
      val scale = r.getDouble(1)
      assert(r.getDouble(3) <= scale / 2 + 1e-9,
        s"mean |dequant err| ${r.getDouble(3)} exceeds scale/2 $scale")
    }
  }

  test("embed_quantize_int8: zero vector quantizes to zero codes with zero error") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("zq").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(0L, Seq.fill(4)(0f), 0),
      org.apache.spark.sql.Row(1L, Seq(1f, -2f, 0.5f, 2f), 0))
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = AnalyticsQueries.queries("embed_quantize_int8")(spark, dir).collect()
    val zero = out.find(_.getLong(0) == 0L).get
    assert(zero.getString(2).split(",").forall(_ == "0") && zero.getDouble(3) === 0.0)
    val v = out.find(_.getLong(0) == 1L).get
    // scale = 2/127; codes = round(x*127/2)
    assert(v.getString(2) === "64,-127,32,127")
  }

  test("agg_count_min: both sketch contracts all-true, exact leg matches groupBy count") {
    val rows = q("agg_count_min").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "CMS must never underestimate")
    assert(rows.forall(_.getBoolean(3)), "CMS eps bound broken on fixture")
    val exact = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === exact(r.getLong(0))))
  }

  test("count-min sketches merge by counter addition: union equals one-pass estimates") {
    import org.apache.spark.util.sketch.CountMinSketch
    val single = CountMinSketch.create(0.01, 0.99, 42)
    (1L to 1000L).foreach(i => single.add(i % 37))
    val a = CountMinSketch.create(0.01, 0.99, 42)
    val b = CountMinSketch.create(0.01, 0.99, 42)
    (1L to 500L).foreach(i => a.add(i % 37))
    (501L to 1000L).foreach(i => b.add(i % 37))
    a.mergeInPlace(b)
    (0L until 37L).foreach(k => assert(a.estimateCount(k) === single.estimateCount(k)))
  }

  test("join_bloom_prune probes natively: no UDF node anywhere in the plan") {
    val plan = q("join_bloom_prune").queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"),
      "the probe must be the native BloomFilterMightContain expression, not a Scala UDF")
    assert(plan.toLowerCase.contains("might_contain"),
      "expected the native might_contain expression in the plan")
  }

  test("join_bloom_prune equals the plain semi-join (bloom admits every true member)") {
    val pruned = q("join_bloom_prune").collect().map(_.toSeq).toSet
    val e = Tables.events(spark, sf)
    val cohort = e.filter(col("event_type") === "purchase" && col("value") > 200d)
      .select(col("user_id")).distinct()
    val plain = e.join(cohort, Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(pruned === plain)
    assert(pruned.nonEmpty, "cohort must select something at sf0.001")
    // and the pruning is real: the bloom pre-filter admits a strict subset
    val cohortUsers = cohort.collect().map(_.getLong(0)).toSet
    assert(cohortUsers.size < e.select(col("user_id")).distinct().count(),
      "build side must be selective for the demo to mean anything")
  }
}
