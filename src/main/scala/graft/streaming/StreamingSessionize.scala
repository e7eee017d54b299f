package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an unbounded event stream — the
  * continuous counterpart of the batch `window_sessionize` pass
  * (RelationalQueries.scala), riding Spark's BUILT-IN `session_window`
  * streaming aggregation rather than hand-rolled keyed state: the operator
  * gets per-key session state with range-merge, watermark-driven
  * finalization + eviction, and state-store pluggability (RocksDB at
  * scale) for free.
  *
  * Semantics: each event at `t` extends its session's end to `t + gap`;
  * an event merges into the open session when it lands at or BEFORE that
  * end (boundary inclusive, spec-pinned), so a new session starts exactly
  * when the inter-event gap is `> gap` — the same rule as the batch
  * `window_sessionize` pass, boundary tie included.
  *
  * Scale: state is one in-flight session range per (user, open session) —
  * O(active users), hash-partitioned across executors, evicted the moment
  * the watermark passes a session's end. Sessions only EMIT on watermark
  * passage (append mode), so the delay is the lateness budget: events
  * older than `delay` behind the global max are dropped, the documented
  * trade of bounded state.
  */
object StreamingSessionize {

  /** `events` must carry `user_id`, an `event_ts` TIMESTAMP (event time,
    * µs precision) and `ts_us` (the same instant as a long, kept so the
    * session bounds aggregate in exact integer µs — the emitted
    * `start_us`/`end_us` are min/max EVENT times, not the window's
    * gap-padded range end). */
  def sessions(events: DataFrame, gap: String, delay: String): DataFrame =
    events
      .withWatermark("event_ts", delay)
      .groupBy(col("user_id"), session_window(col("event_ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
}
