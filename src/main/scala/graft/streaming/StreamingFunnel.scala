package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** An arriving event for the funnel state machine. */
final case class FunnelInput(user_id: Long, event_id: Long, ts_us: Long, event_type: String)

/** One completed view→click→purchase funnel. */
final case class FunnelDone(
    user_id: Long, view_ts_us: Long, click_ts_us: Long, purchase_ts_us: Long)

/** Streaming ordered-funnel detection (view → click → purchase) with O(1)
  * state per user — the streaming twin of the batch `window_funnel`
  * report: where the batch operator measures depth over a bounded window,
  * this one EMITS a completion row the moment a user's first
  * view-then-click-then-purchase chain closes, the shape a real-time
  * conversion/alerting consumer needs.
  *
  * State design: the classic funnel state machine — the accepted view's
  * (ts, id), the accepted click's (ts, id), and a done flag. Three longs
  * and a boolean per user, updated in O(1) per event, never an event
  * buffer; at scale the state store holds |users observed| × ~40 bytes,
  * hash-partitioned by key like any transformWithState state (completed
  * users could be evicted via TTL — the flag only suppresses re-emission).
  *
  * Semantics: events fold in (ts_us, event_id) order; a click is accepted
  * iff it sorts strictly after the ACCEPTED view (the user's first view),
  * a purchase iff strictly after the accepted click (the first qualifying
  * click); the first qualifying purchase completes the funnel and emits —
  * exactly the "first minimal chain" the batch oracle selects with three
  * chained row_number picks. Ordering caveat as [[StreamingAnomaly]]:
  * each batch slice is sorted before folding, so the fold is exact under
  * the gate's AvailableNow single-batch replay and under ts-ordered
  * multi-batch feeds (spec-pinned); arbitrarily late cross-batch events
  * need an upstream watermark, the same production stance as the anomaly
  * scorer. */
object StreamingFunnel {

  private final case class Progress(
      viewTs: Long, viewId: Long, clickTs: Long, clickId: Long, done: Boolean)

  private val Empty = Progress(-1L, -1L, -1L, -1L, done = false)

  private class Processor extends StatefulProcessor[Long, FunnelInput, FunnelDone] {
    @transient private var state: ValueState[Progress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Progress](
        "funnel", Encoders.product[Progress], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FunnelInput],
                                 timers: TimerValues): Iterator[FunnelDone] = {
      var p = if (state.exists()) state.get() else Empty
      val out = Seq.newBuilder[FunnelDone]
      rows.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" if p.viewTs < 0 =>
            p = p.copy(viewTs = e.ts_us, viewId = e.event_id)
          case "click" if p.viewTs >= 0 && p.clickTs < 0 =>
            // sorted fold ⇒ e sorts after the accepted view within this
            // batch; across ts-ordered batches the guard keeps it exact
            if (e.ts_us > p.viewTs || (e.ts_us == p.viewTs && e.event_id > p.viewId))
              p = p.copy(clickTs = e.ts_us, clickId = e.event_id)
          case "purchase" if p.clickTs >= 0 && !p.done =>
            if (e.ts_us > p.clickTs || (e.ts_us == p.clickTs && e.event_id > p.clickId)) {
              p = p.copy(done = true)
              out += FunnelDone(user, p.viewTs, p.clickTs, e.ts_us)
            }
          case _ => ()
        }
      }
      state.update(p)
      out.result().iterator
    }
  }

  /** Completed-funnel stream of `events` (needs user_id, event_id, ts_us,
    * event_type). Requires the RocksDB state store provider, like every
    * transformWithState query. */
  def completions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_us").cast("long"), col("event_type").cast("string"))
      .as[FunnelInput]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
