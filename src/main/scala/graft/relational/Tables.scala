package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Per-stream event order: ties on ts broken by event_id (unique). */
  val seqOrder: Window.type => Unit = _ => ()

  def seqWindow =
    Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))

  /** events → long form (user_id, t, value); t is 0-based. */
  def eventsLong(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .withColumn("t", (row_number().over(seqWindow) - 1).cast("long"))
      .select(col("user_id"), col("t"), col("value"))
}
