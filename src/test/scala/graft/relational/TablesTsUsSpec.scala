package graft.relational

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.tsUsCol]]'s µs normalization across every physical `ts`
  * encoding the fixtures have shipped (round 7 changed encoding between the
  * builder's close and the gate run, breaking 7 queries — this spec makes
  * the next drift a red test, not a gate forensic).
  *
  * The equality contract: for the same instant, int64-nanos, TIMESTAMP, and
  * TIMESTAMP_NTZ inputs must all produce the SAME µs-since-epoch longs that
  * DuckDB's `epoch_us` yields (NTZ wall-clock read as UTC — the session
  * timezone TestSpark pins, as [[Tables.events]] does at runtime). */
class TablesTsUsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  // instants exercising: epoch, sub-ms µs precision, a pre-1970 negative,
  // and a far-future value; micros chosen non-round to catch truncation vs
  // rounding mismatches
  private val micros = Seq(0L, 1723500000123456L, -862000000654321L, 4102444800999999L)

  private def tsUsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(Tables.tsUsCol(df).as("ts_us")).orderBy(col("ts_us"))
      .collect().map(_.getLong(0)).toSeq

  test("int64-nanos, timestamp, and timestamp_ntz encodings normalize to identical µs") {
    val fromNanos = micros.map(_ * 1000L).toDF("ts")
    val fromTs = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val fromNtz = fromTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(fromTs.schema("ts").dataType === TimestampType)
    assert(fromNtz.schema("ts").dataType === TimestampNTZType)
    val expected = micros.sorted
    assert(tsUsOf(fromNanos) === expected)
    assert(tsUsOf(fromTs) === expected)
    assert(tsUsOf(fromNtz) === expected)
  }

  test("timestamp_ntz round-trips through parquet (the current fixture encoding)") {
    val dir = java.nio.file.Files.createTempDirectory("tsus").toString
    micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = spark.read.parquet(s"$dir/events.parquet")
    assert(back.schema("ts").dataType === TimestampNTZType)
    assert(tsUsOf(back) === micros.sorted)
  }

  test("unsupported ts type fails loudly at plan time") {
    val bad = Seq("x").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.tsUsCol(bad))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("embeddings loader normalizes a double-typed fixture to array<float>") {
    val dir = java.nio.file.Files.createTempDirectory("embdrift").toString
    Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(0.5, 0.25, 0.125)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = Tables.embeddings(spark, dir)
    assert(e.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = true))
    // the exact values survive (these doubles are float-representable)
    val row = e.orderBy(col("vec_id")).head()
    assert(row.getSeq[Float](1) === Seq(1.0f, 2.0f, 3.0f))
    // the current fixture (already float) passes through unchanged
    val fixture = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(fixture.schema("embedding").dataType.simpleString === "array<float>")
  }

  test("eventsTsUs on the sf0.001 fixture: µs magnitude, non-null, ordered like ts") {
    val d = "/root/testdata/sf0.001"
    val df = Tables.eventsTsUs(spark, d)
    assert(df.schema("ts_us").dataType === LongType)
    val stats = df.agg(count(lit(1)), count(col("ts_us")),
      min(col("ts_us")), max(col("ts_us"))).head()
    assert(stats.getLong(0) === stats.getLong(1)) // no nulls introduced
    // fixture events live in the 2020s: 2015-01-01 .. 2035-01-01 in µs
    assert(stats.getLong(2) > 1420070400000000L && stats.getLong(3) < 2051222400000000L)
    // ts_us order == raw ts order (per user: the seqWindow contract)
    val disorder = df.withColumn("prev",
        lag(col("ts_us"), 1).over(Tables.seqWindow))
      .filter(col("prev") > col("ts_us")).count()
    assert(disorder === 0L)
  }
}
