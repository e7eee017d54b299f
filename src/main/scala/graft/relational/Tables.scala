package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

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

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4's
    * reader rejects (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is on. With it,
    * `ts` surfaces as LongType nanoseconds-since-epoch: sort order is
    * unchanged and `ts div 1000` equals DuckDB's `epoch_us(ts)`. Set here (a
    * runtime SQL conf) so any session the driver hands us reads it fine.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(spark, dir, "events")
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
