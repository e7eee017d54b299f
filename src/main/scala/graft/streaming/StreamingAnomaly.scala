package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One scored arrival: the event plus the baseline it was judged against
  * (the user's FULL history before it) and the gated z verdict. */
final case class AnomalyScore(
    event_id: Long, user_id: Long, ts_us: Long, value: Double,
    n_base: Long, mean_r: Option[Double], std_r: Option[Double],
    z: Option[Double], is_anomaly: Boolean)

/** An arriving event in processing order. */
final case class AnomalyInput(user_id: Long, event_id: Long, ts_us: Long, value: Double)

/** Streaming per-entity anomaly scoring with O(1) state: each arrival is
  * z-scored against the running mean/stddev of ALL of its user's prior
  * events, then folded into the state — the expanding-window twin of the
  * batch `ts_anomaly_zscore` (trailing-20) and the numeric cousin of
  * `stream_fit_predict`'s PFSA scoring.
  *
  * State design: a single Welford accumulator (n, mean, M2) per user —
  * three doubles, updated in O(1) per event, never a buffer of history.
  * At 100 TB the state store holds |active users| × 24 bytes, keyed-hash
  * partitioned like any transformWithState state; contrast with the batch
  * form whose expanding window re-sorts each user's full history per run.
  * Welford's update is numerically stable (no sumsq cancellation), which
  * is what keeps the 6-dp-rounded mean/std equal to the oracle's
  * `avg`/`stddev_samp` over the same prefix.
  *
  * Ordering: state updates must fold events in event-time order, but
  * rows within a micro-batch arrive unordered — the processor sorts each
  * user's BATCH slice by (ts_us, event_id) before folding. That per-key
  * per-trigger buffer is the user's arrival volume in the trigger (the
  * whole history only under an AvailableNow full replay, as in the gate);
  * the persisted state stays O(1). Late events landing in a later trigger
  * would fold out of order — a production deployment puts a watermark
  * upstream or accepts the approximation; the gate replay is single-batch
  * so the fold order is exact and the memory-sink result equals the batch
  * oracle row-for-row.
  *
  * Verdict gating mirrors the batch twin: z is emitted only when the
  * baseline has ≥ 5 points and positive rounded stddev; z is computed
  * from the ROUNDED mean/std operands and itself rounded to 4 dp before
  * the |z| > 3 flag, so both engines divide identical operands.
  */
object StreamingAnomaly {

  /** n, the running sum in EXACT integer micro-units, plus the Welford
    * mean/M2 pair for the numerically stable stddev. The integer sum is
    * what makes mean_r bit-equal to the oracle: the fixture's values are
    * exact 6-dp decimals, but a double-typed running sum (plain or
    * Welford) drifts a ulp around exact dyadic means like sum/32 and then
    * rounds the OTHER way at a 6-dp half boundary (observed 38×/10k rows
    * at sf0.01, every one at a power-of-two n_base); summing decimals as
    * scaled integers is order-independent and exact, and the oracle
    * mirrors it with a DECIMAL-cast window sum. mean = (µsum/10⁶)/n with
    * both divisions in double — the identical two correctly-rounded ops
    * DuckDB performs casting its exact decimal sum to double and dividing
    * by the frame count. */
  private final case class Welford(n: Long, sumMicros: Long, mean: Double, m2: Double)

  private class Processor extends StatefulProcessor[Long, AnomalyInput, AnomalyScore] {
    @transient private var state: ValueState[Welford] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Welford](
        "welford", Encoders.product[Welford], TTLConfig.NONE)

    private def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

    override def handleInputRows(user: Long, rows: Iterator[AnomalyInput],
                                 timers: TimerValues): Iterator[AnomalyScore] = {
      var w = if (state.exists()) state.get() else Welford(0L, 0L, 0.0, 0.0)
      val out = rows.toArray.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        val (meanR, stdR) =
          if (w.n == 0) (None, None)
          else {
            // HALF_UP(µsum/n) computed ENTIRELY in int64 micro-units —
            // rounding the exact rational, not a double approximation of
            // it: at dyadic n (observed: n=32 at sf0.1) the true mean can
            // sit exactly on a 6-dp half boundary, where rounding the
            // double diverges between engines by one ulp of the 6th
            // decimal; integer floor((2µ+n)/2n) (sign-mirrored) is the
            // same single arithmetic answer everywhere, and the final
            // /1e6 is one correctly-rounded double op in both engines
            val mMicro =
              if (w.sumMicros >= 0L) (2L * w.sumMicros + w.n) / (2L * w.n)
              else -((2L * -w.sumMicros + w.n) / (2L * w.n))
            val m = Some(mMicro.toDouble / 1e6)
            val s = if (w.n >= 2) Some(r(math.sqrt(w.m2 / (w.n - 1).toDouble), 6)) else None
            (m, s)
          }
        val gated = w.n >= 5 && stdR.exists(_ > 0.0)
        val z = if (gated) Some(r((e.value - meanR.get) / stdR.get, 4)) else None
        val score = AnomalyScore(e.event_id, user, e.ts_us, e.value,
          w.n, meanR, stdR, z, z.exists(v => math.abs(v) > 3.0))
        val n1 = w.n + 1
        val delta = e.value - w.mean
        val mean1 = w.mean + delta / n1.toDouble
        w = Welford(n1, w.sumMicros + Math.round(e.value * 1e6), mean1,
          w.m2 + delta * (e.value - mean1))
        score
      }
      state.update(w)
      out.iterator
    }
  }

  /** Scored stream of `events` (needs user_id, event_id, ts_us, value;
    * null values dropped as in the batch twin). Requires the RocksDB
    * state store provider, like every transformWithState query. */
  def scored(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_us").cast("long"), col("value").cast("double"))
      .as[AnomalyInput]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
