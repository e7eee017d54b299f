package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-analytics operators over the event stream: skew-mitigated
  * joins, hierarchy (rollup) aggregation, wide pivots, and event-time
  * sliding/lag windows. These are the reporting/feature-engineering shapes a
  * production deployment of the reference pipeline (patternly
  * detection.py's fit/predict loop) feeds and consumes around the model —
  * the reference does them in pandas on the driver
  * (e.g. detection.py:124-149's frame reshaping); here each is a single
  * distributed Catalyst plan with the same hash-parity conventions as
  * [[RelationalQueries]] (round(x,6) floats, BIGINT ints, total ORDER BY,
  * identical aliases both engines).
  */
object AnalyticsQueries {

  private def eventsUs(s: SparkSession, d: String): DataFrame = Tables.eventsTsUs(s, d)

  /** Number of salt replicas for the skew join. At 100 TB this scales with
    * the observed skew ratio (heaviest-key rows / mean rows per task);
    * 8 keeps the fixture demonstration cheap while exercising the full
    * replicate+scatter plan shape. */
  private[relational] val SkewSalts = 8

  // ------------------------------------------------------------ skew-salted join
  /** Fact-to-dimension join under HEAVY key skew, made uniform by salting —
    * the standard fix when the hot key would serialize into one task and AQE
    * skew-join can't help (it only splits SORT-MERGE partitions, and a
    * downstream co-partition requirement or a shuffle-hash build side can
    * pin the plan). The `events` fact has only 5 distinct `event_type`
    * values, so an unsalted shuffle join degenerates to ≤5 effective tasks
    * at ANY scale; here the dimension is replicated `SkewSalts`× (bounded:
    * |dim| · S rows) and each fact row picks a deterministic salt from a
    * hash of its unique id, so the join key `(event_type, salt)` spreads
    * every hot key over S tasks. The salt never leaves the plan: the result
    * is VALUE-IDENTICAL to the unsalted join (spec-asserted, and the DuckDB
    * oracle is the plain join). The dimension here is tiny (it would
    * broadcast in production — `stream_enrich` shows that shape); the
    * `shuffle_hash` hint pins the shuffle path the technique exists for,
    * i.e. a dimension too big to broadcast joined to a skewed fact. */
  private def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val dim = e.groupBy(col("event_type"))
      .agg(round(avg(col("value")), 6).as("type_avg"))
      .withColumn("salt", explode(sequence(lit(0), lit(SkewSalts - 1))))
    val fact = e.withColumn("salt",
      pmod(xxhash64(col("event_id")), lit(SkewSalts)).cast("int"))
    fact.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"), col("value"), col("type_avg"),
        round(col("value") - col("type_avg"), 6).as("diff"))
      .orderBy(col("event_id"))
  }

  // ----------------------------------------------------------- rollup hierarchy
  /** Hierarchy aggregation with ROLLUP — per-(type, day) detail, per-type
    * subtotals, and the grand total in ONE pass. Catalyst expands the
    * grouping sets before the exchange, so the plan stays a single
    * map-side-combinable hash aggregate (no re-scan per level — at 100 TB
    * that is the difference between one corpus pass and three). Null
    * ordering is pinned NULLS LAST on both engines (Spark defaults nulls
    * FIRST for asc, DuckDB LAST — one of them must move). */
  private def aggRollup(s: SparkSession, d: String): DataFrame =
    eventsUs(s, d)
      .withColumn("day", expr("ts_us div 86400000000"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy(col("event_type").asc_nulls_last, col("day").asc_nulls_last)

  /** The pivot's fixed column set. Passing EXPLICIT values to `pivot` is
    * the 100-TB form: without them Spark runs a hidden collect-distinct
    * scan over the fact table just to learn the output schema (and a
    * high-cardinality key would OOM the driver); with them the plan is one
    * hash aggregate. */
  private[relational] val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  // --------------------------------------------------------------------- pivot
  /** Long→wide reshape: one row per user, one count column per event type —
    * the feature-matrix layout every downstream model fit consumes (the
    * reference builds exactly this shape driver-side with
    * `pandas.pivot_table` in its notebooks). Pivot-with-count yields NULL
    * for absent (user, type) combinations; filled to 0 to match the
    * conditional-aggregation semantics (DuckDB `count(*) FILTER`). */
  private def aggPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotTypes)
      .orderBy(col("user_id"))

  // ------------------------------------------------------- event-time windows
  /** Trailing 1-hour moving average per user — a RANGE window over
    * event-time µs, not a row-count frame: irregular event spacing means
    * "last N rows" is meaningless while "last hour" is the monitoring
    * semantic. One exchange on user_id + one sort; ties on ts_us all enter
    * the frame on both engines (RANGE, not ROWS, so frame membership is
    * value-determined and deterministic without a tiebreaker). */
  private def windowMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    eventsUs(s, d)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        round(avg(col("value")).over(w), 6).as("avg_1h"),
        count(col("value")).over(w).as("n_1h"))
      .orderBy(col("event_id"))
  }

  /** Per-user lag/lead derivatives: inter-event gap, value delta, and the
    * next event's type — the session-feature primitives (time-since-last,
    * trajectory, next-action label for training). Order within a user is
    * pinned by (ts_us, event_id) so ties are deterministic on both
    * engines; all three windows share one exchange + one sort. */
  private def windowLagDelta(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    eventsUs(s, d)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
        round(col("value") - lag(col("value"), 1).over(w), 6).as("value_delta"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_salted" -> (joinSkewSalted _),
    "agg_rollup" -> (aggRollup _),
    "agg_pivot" -> (aggPivot _),
    "window_moving_avg" -> (windowMovingAvg _),
    "window_lag_delta" -> (windowLagDelta _),
  )

  val oracle: Map[String, String] = Map(
    // the salted join must equal the PLAIN join — salt is plan-internal
    "join_skew_salted" ->
      """WITH dim AS (SELECT event_type, round(avg(value), 6) AS type_avg
        |             FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value, d.type_avg,
        |       round(e.value - d.type_avg, 6) AS diff
        |FROM events e JOIN dim d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "agg_rollup" ->
      """WITH e AS (SELECT event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |                  value
        |           FROM events)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
        |       round(avg(value), 6) AS avg_value
        |FROM e GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type NULLS LAST, day NULLS LAST""".stripMargin,
    // conditional aggregation IS the pivot's semantics
    "agg_pivot" ->
      """SELECT user_id,
        |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_moving_avg" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        |           FROM events)
        |SELECT event_id, user_id, ts_us, value,
        |       round(avg(value) OVER w, 6) AS avg_1h,
        |       CAST(count(value) OVER w AS BIGINT) AS n_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "window_lag_delta" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        |           FROM events)
        |SELECT event_id, user_id, ts_us,
        |       ts_us - lag(ts_us, 1) OVER w AS gap_us,
        |       round(value - lag(value, 1) OVER w, 6) AS value_delta,
        |       lead(event_type, 1) OVER w AS next_type
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY event_id""".stripMargin,
  )
}
