package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders + the canonical long-form sequence view of `events`.
  *
  * The reference's central structure is a wide frame with one symbol
  * sequence per row (reference detection.py:81,376). Our engine's canonical
  * representation is the long/tidy form `(seq_id, t, value)` (SURVEY.md
  * §1.4), derived here from the driver's `events` table with
  * `seq_id = user_id` and `t` = rank of `(ts, event_id)` within the user.
  */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` encoding has CHANGED UNDER US once (round 7:
    * parquet TIMESTAMP(NANOS) → TIMESTAMP(MICROS,ntz) between the builder's
    * close and the gate run, breaking every temporal operator that assumed
    * int64 nanos). A real engine ingesting third-party parquet cannot assume
    * one physical timestamp encoding, so this loader accepts all of them:
    * nanosAsLong stays on so a NANOS fixture surfaces as LongType instead of
    * failing the scan (PARQUET_TYPE_ILLEGAL), a MICROS fixture surfaces as
    * TimestampType/TimestampNTZType, and [[tsUsCol]] normalizes whichever
    * arrived to µs-since-epoch. The session timezone is pinned to UTC here (a
    * runtime SQL conf, so it holds in any session the driver hands us):
    * DuckDB's `epoch_us` treats a naive timestamp as UTC, and the NTZ→
    * timestamp cast in [[tsUsCol]] must interpret the wall-clock value the
    * same way for the oracles to hash-match.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val e = tbl(spark, dir, "events")
    // `value` pinned to double (a no-op on the current fixture): a
    // float-typed regeneration would otherwise run every quantize/agg in
    // float32 and hash-diverge from the DuckDB oracle's float64 math —
    // the fp cousin of the ts drift this loader already absorbs
    e.schema("value").dataType match {
      case org.apache.spark.sql.types.DoubleType => e
      case _ => e.withColumn("value", col("value").cast("double"))
    }
  }

  /** µs-since-epoch projection of `events.ts`, robust to the fixture's
    * physical encoding (see [[events]]): int64 nanos → `div 1000`
    * (truncating, = DuckDB `epoch_us` on the same instant); TIMESTAMP →
    * `unix_micros`; TIMESTAMP_NTZ → cast through TimestampType under the
    * UTC session timezone pinned in [[events]], then `unix_micros` — both
    * µs paths are exact (no sub-µs to truncate). Any other type fails
    * loudly at plan time rather than silently miscomputing. */
  def tsUsCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType        => expr("ts div 1000")
    case TimestampType   => unix_micros(col("ts"))
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other (expected int64-nanos, timestamp, or timestamp_ntz)")
  }

  /** [[events]] with the normalized `ts_us` column appended — the view every
    * temporal operator (as-of/range joins, sessionization, notna) reads. */
  def eventsTsUs(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    e.withColumn("ts_us", tsUsCol(e))
  }

  /** embeddings.parquet with the `embedding` column normalized to
    * `array<float>` — the element type the ANN kernels' `Seq[Float]` UDFs
    * (Similarity.scala) deserialize. Same robustness class as the `ts`
    * normalization above: a regenerated fixture switching to
    * `array<double>` would otherwise throw ClassCastException inside ten
    * UDF call sites at runtime; here it costs one cast at scan, and an
    * unexpected shape fails loudly at plan time. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = tbl(spark, dir, "embeddings")
    e.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => e
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        e.withColumn("embedding", col("embedding").cast("array<float>"))
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding has unsupported type $other (expected array<float|double>)")
    }
  }

  /** Per-stream event order: ties on ts broken by event_id (unique). */
  def seqWindow: WindowSpec =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** events → long form (user_id, t, value); t is 0-based. */
  def eventsLong(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("t", (row_number().over(seqWindow) - 1).cast("long"))
      .select(col("user_id"), col("t"), col("value"))
}
