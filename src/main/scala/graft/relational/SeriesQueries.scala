package graft.relational

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics and corpus-operations wave: rolling z-score
  * anomaly flags, OHLC downsampling, truncated exponential moving
  * averages, linear gap interpolation, edit-distance fuzzy dedup,
  * deterministic train/val/test splits, decile profiling, small-file
  * compaction, and distribution-moment statistics.
  *
  * The reference's detection loop consumes evenly-sampled per-entity
  * series (patternly detection.py:81-124 assumes one aligned sequence per
  * row and its notebooks resample/clean driver-side in pandas before
  * `fit`); these operators are the distributed versions of that
  * preparation plus the corpus-ops a production deployment runs around it.
  * Conventions match [[RelationalQueries]]/[[AnalyticsQueries]]: floats
  * `round(x, 6)` (or wider where the value is a ratio of large sums —
  * noted per query), counts BIGINT, total ORDER BY, identical aliases in
  * the Spark plan and the DuckDB oracle, and any value feeding a
  * comparison or rank is rounded BEFORE the comparison so a last-ulp
  * engine difference can't flip a flag.
  */
object SeriesQueries {

  private def eventsUs(s: SparkSession, d: String): DataFrame = Tables.eventsTsUs(s, d)
  private def docsT(s: SparkSession, d: String): DataFrame = Tables.tbl(s, d, "documents")

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  // ----------------------------------------------------- rolling z-score anomaly
  /** Rolling z-score anomaly detection: each event scored against the
    * trailing 20 events of ITS OWN user (frame excludes the current row —
    * a point must not dilute its own baseline), flagged when |z| > 3 with
    * at least 5 baseline points. One exchange on user_id + one sort; the
    * frame is ROWS-bounded so state per row is O(20) regardless of data
    * scale. mean/std are rounded to 6 dp FIRST and z computed from the
    * rounded values, so both engines divide bit-identical operands and the
    * flag (compared on the 4-dp-rounded z) cannot flip on accumulation
    * order. The streaming twin of this shape is `stream_fit_predict`;
    * this is the batch/backfill form. */
  private def tsAnomalyZscore(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-20, -1)
    val base = col("n_base") >= 5 && col("std_r") > 0
    eventsUs(s, d).filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        count(col("value")).over(w).as("n_base"),
        round(avg(col("value")).over(w), 6).as("mean_r"),
        round(stddev_samp(col("value")).over(w), 6).as("std_r"))
      .withColumn("z", when(base, round((col("value") - col("mean_r")) / col("std_r"), 4)))
      .withColumn("is_anomaly", coalesce(when(base, abs(col("z")) > 3.0), lit(false)))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------- OHLC downsample
  /** Hourly open/high/low/close bars per event type — the canonical
    * time-series downsample. Open/close are `min_by`/`max_by` over the
    * deterministic (ts_us, event_id) struct order, so the whole bar is ONE
    * map-side-combinable hash aggregate: no window, no second pass, and
    * at 100 TB the partial aggregation collapses each (type, hour) to a
    * single row per map task before the exchange. Values are copied, not
    * recomputed, so open/high/low/close hash exactly; only the volume sum
    * is rounded. */
  private def tsOhlc(s: SparkSession, d: String): DataFrame =
    eventsUs(s, d).filter(col("value").isNotNull)
      .withColumn("bucket", expr("ts_us div 3600000000"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
        round(sum(col("value")), 6).as("volume"))
      .orderBy(col("event_type"), col("bucket"))

  // --------------------------------------------------- truncated EWMA smoothing
  /** Exponentially-weighted moving average per user, truncated at K=20
    * lags (α = 0.3 ⇒ the dropped tail carries 0.7²⁰ ≈ 8·10⁻⁴ of the
    * weight). The exact recurrence ewmaᵢ = α·vᵢ + (1−α)·ewmaᵢ₋₁ is
    * inherently sequential — distributing it needs either a per-key
    * sorted mapPartitions scan or the overflow-prone pow(1/(1−α), rn)
    * prefix trick; the K-truncated form instead stays a pure window plan:
    * collect the ROWS frame, weight it with codegen'd higher-order
    * functions (`zip_with` + `aggregate` — no UDF), and normalize by the
    * closed-form weight sum (1−0.7ⁿ)/0.3. One exchange + one sort, O(K)
    * state per row, identical at any scale. */
  private def tsEwma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-19, 0)
    eventsUs(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
        collect_list(col("value")).over(w).as("vs"))
      .withColumn("ewma", expr(
        """round(
          |  aggregate(
          |    zip_with(vs, sequence(1, size(vs)),
          |             (v, j) -> v * power(0.7D, cast(size(vs) - j AS DOUBLE))),
          |    0D, (acc, x) -> acc + x)
          |  / ((1.0D - power(0.7D, cast(size(vs) AS DOUBLE))) / 0.3D), 6)""".stripMargin))
      .drop("vs")
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  // ------------------------------------------------------- linear interpolation
  /** Gap-fill onto the 1-hour grid with LINEAR interpolation between the
    * surrounding observed buckets (edges extend flat) — the companion to
    * `ts_resample`'s forward fill, and the alignment the reference's
    * evenly-sampled-series assumption actually wants when sensors drop
    * out. Same scale shape as ts_resample: combinable bucket means, a
    * `sequence()` grid explode bounded by time-span (not event count),
    * then TWO ignore-nulls windows (previous/next observed value+bucket)
    * over one exchange. Bucket means are rounded BEFORE interpolating, so
    * both engines interpolate identical operands against exact integer
    * bucket distances — the interpolated value is bit-identical before
    * its final round. That final round is written as
    * `floor(x·10⁶ + 0.5)/10⁶` rather than `round(x, 6)`: a midpoint
    * interpolation of two 6-dp values lands EXACTLY on a 7-digit decimal
    * half, where Spark (shortest-decimal HALF_UP) and DuckDB (binary
    * round) disagree on the same bits; floor of identical doubles is
    * identical everywhere (values are non-negative here, so half-up ≡
    * half-away). */
  private def tsInterpolate(s: SparkSession, d: String): DataFrame = {
    val pb = eventsUs(s, d).filter(col("value").isNotNull)
      .withColumn("bucket", expr("ts_us div 3600000000"))
      .groupBy(col("user_id"), col("bucket"))
      .agg(round(avg(col("value")), 6).as("v_raw"))
    val grid = pb.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("user_id"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val wp = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(0, Window.unboundedFollowing)
    grid.join(pb, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        (col("bucket") * lit(3600000000L)).as("ts_us"),
        col("v_raw").isNull.as("is_gap"),
        col("v_raw"),
        last(col("v_raw"), ignoreNulls = true).over(wp).as("pv"),
        last(when(col("v_raw").isNotNull, col("bucket")), ignoreNulls = true).over(wp).as("pbk"),
        first(col("v_raw"), ignoreNulls = true).over(wn).as("nv"),
        first(when(col("v_raw").isNotNull, col("bucket")), ignoreNulls = true).over(wn).as("nbk"))
      .withColumn("v",
        floor((when(col("v_raw").isNotNull, col("v_raw"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("bucket") - col("pbk")).cast("double") /
            (col("nbk") - col("pbk")).cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6))
      .select(col("user_id"), col("bucket"), col("ts_us"), col("is_gap"), col("v"))
      .orderBy(col("user_id"), col("bucket"))
  }

  // --------------------------------------------------------- fuzzy (edit) dedup
  /** Bucket cap for the fuzzy-dedup blocks — same role as the caps in
    * dedup_minhash/dedup_simhash: no block may quadratically explode. */
  private[relational] val FuzzyBlockCap = 50

  /** Edit-distance near-duplicate pairs: docs blocked by (lang, 20-char
    * length bucket, 8-char prefix signature), pairs WITHIN a block
    * compared by Levenshtein distance over the normalized 80-char prefix,
    * kept at distance ≤ 5. Blocking bounds the quadratic stage: blocks are
    * capped at [[FuzzyBlockCap]] docs (cap and filter both deterministic,
    * replicated by the oracle), so the self-join fans out ≤ cap× and the
    * O(p²)-per-pair edit distance runs on fixed 80-char operands, never
    * full documents. At 100 TB the standard recall patch for boundary
    * misses (a near-dup pair straddling a length-bucket edge) is a second
    * pass with offset buckets; the block shape and cost are identical.
    * Levenshtein here is codegen'd (`functions.levenshtein`), no UDF. */
  private def dedupFuzzy(s: SparkSession, d: String): DataFrame = {
    val dd = docsT(s, d).select(col("doc_id"), col("lang"),
      substring(col("text"), 1, 80).as("prefix"),
      substring(col("text"), 1, 8).as("sig"),
      expr("n_chars div 20").as("lb"))
    val keys = dd.groupBy(col("lang"), col("lb"), col("sig"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, FuzzyBlockCap))
      .select(col("lang"), col("lb"), col("sig"))
    val k = dd.join(keys, Seq("lang", "lb", "sig"))
    val a = k.select(col("lang"), col("lb"), col("sig"),
      col("doc_id").as("doc_a"), col("prefix").as("pa"))
    val b = k.select(col("lang"), col("lb"), col("sig"),
      col("doc_id").as("doc_b"), col("prefix").as("pb"))
    a.join(b, Seq("lang", "lb", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("dist") <= 5)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------ train/val/test split
  /** Deterministic 80/10/10 train/val/test assignment: the split key is a
    * content-addressed md5 bucket of doc_id, so re-runs, task retries, and
    * incremental corpus additions all land every document in the SAME
    * split — the property `rand()` splits lack and leakage audits require.
    * Zero shuffles: one codegen'd projection (the presentation ORDER BY is
    * gate-only). Stratification is implicit (the hash is independent of
    * source/lang, so proportions hold per stratum in expectation); the
    * exact-quota variant is `corpus_mix`. */
  private def sampleSplit(s: SparkSession, d: String): DataFrame =
    docsT(s, d).select(col("doc_id"), col("source"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 100)
        .as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("source"), col("split"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ decile profile
  /** Decile profile of document length: ntile(10) over the deterministic
    * (n_chars, doc_id) order, then per-decile count/min/max/mean — the
    * length-distribution report a corpus audit starts from. NOTE the
    * global ntile is a single-partition sort by construction; at 100 TB
    * the same report comes from `approx_percentile` cut points (the
    * `agg_quantiles` plan) with a broadcast bucket join — this exact form
    * exists because ntile's equal-COUNT buckets (not equal-range) are the
    * audit semantic and are oracle-checkable bit-for-bit. */
  private def windowNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("n_chars"), col("doc_id"))
    docsT(s, d).select(col("doc_id"), col("n_chars"), ntile(10).over(w).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
      .select(col("decile").cast("long").as("decile"), col("n"),
        col("min_chars"), col("max_chars"), col("avg_chars"))
      .orderBy(col("decile"))
  }

  // -------------------------------------------------------- small-file compact
  /** Target compacted file size. Tiny here so the fixture demonstrably
    * compacts 64 shards into a handful of files; production uses 128 MiB–
    * 1 GiB per file. */
  private[relational] val CompactTargetBytes = 256L * 1024

  private[relational] def parquetParts(s: SparkSession, dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(f => f.getPath.getName.startsWith("part-") && f.getPath.getName.endsWith(".parquet"))
  }

  /** Small-file compaction — the maintenance pass every streaming or
    * fine-grained-partitioned landing zone needs: thousands of KB-sized
    * parquet files (here: a 64-way scatter write) are rewritten into
    * ceil(bytes / target) right-sized files, and the result re-read and
    * aggregated per source. The oracle checks LOSSLESSNESS (per-source
    * counts, distinct ids, and char totals equal the original table); the
    * file-count collapse itself is spec-asserted. At 100 TB this is the
    * difference between a scan scheduling 10⁶ tasks of 100 KB and 10³
    * tasks of 128 MB — NameNode/listing pressure and task overhead both
    * drop three orders of magnitude; the repartition is one round-robin
    * exchange sized by the measured input bytes, never a collect. */
  private def compactSmallFiles(s: SparkSession, d: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_compact")
    try {
      docsT(s, d).repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
      val bytes = parquetParts(s, s"$tmp/small").map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / CompactTargetBytes).toInt)
      s.read.parquet(s"$tmp/small").repartition(nOut)
        .write.mode("overwrite").parquet(s"$tmp/compact")
      s.read.parquet(s"$tmp/compact")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .orderBy(col("source"))
        .localCheckpoint(true)
    } finally deleteRecursively(tmp)
  }

  /** Compaction file counts (for the spec): (small-file count, bytes,
    * planned output count, actual compacted file count). */
  private[relational] def compactCounts(s: SparkSession, d: String): (Int, Long, Int, Int) = {
    val tmp = Files.createTempDirectory("graft_compact_spec")
    try {
      docsT(s, d).repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
      val parts = parquetParts(s, s"$tmp/small")
      val bytes = parts.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / CompactTargetBytes).toInt)
      s.read.parquet(s"$tmp/small").repartition(nOut)
        .write.mode("overwrite").parquet(s"$tmp/compact")
      (parts.length, bytes, nOut, parquetParts(s, s"$tmp/compact").length)
    } finally deleteRecursively(tmp)
  }

  // -------------------------------------------------------- distribution moments
  /** Higher distribution moments per return flag: population std, skewness
    * g₁ = m₃/m₂^1.5, excess kurtosis g₂ = m₄/m₂² − 3 — the shape stats a
    * drift monitor tracks beyond mean/variance. TWO passes by design: the
    * mean is computed, ROUNDED to 6 dp, broadcast back, and the central
    * powers taken against the rounded mean — single-pass raw power sums
    * (Σx⁴ etc.) suffer catastrophic cancellation at mean≫std and would
    * hash-diverge between engines; centering first keeps every term
    * O(std⁴) and the engine difference below the output rounding
    * (skew/kurt at 5 dp, std at 4 dp — these are ratios of large sums, so
    * 6 dp would sit inside fp noise at 100-TB row counts). Both passes are
    * map-side-combinable aggregates; the mean frame (|flags| rows) is
    * broadcast. */
  private def aggMoments(s: SparkSession, d: String): DataFrame = {
    val li = Tables.tbl(s, d, "lineitem")
    val m = li.groupBy(col("l_returnflag").as("flag"))
      .agg(round(avg(col("l_extendedprice")), 6).as("mean_r"))
    val dev = col("l_extendedprice") - col("mean_r")
    li.join(broadcast(m), li("l_returnflag") === m("flag"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), first(col("mean_r")).as("mean_r"),
        sum(pow(dev, 2)).as("s2"), sum(pow(dev, 3)).as("s3"), sum(pow(dev, 4)).as("s4"))
      .select(col("flag"), col("n"), col("mean_r"),
        round(sqrt(col("s2") / col("n")), 4).as("std_pop"),
        round((col("s3") / col("n")) / pow(col("s2") / col("n"), 1.5), 5).as("skewness"),
        round((col("s4") / col("n")) / pow(col("s2") / col("n"), 2) - 3, 5).as("kurtosis"))
      .orderBy(col("flag"))
  }

  // ------------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_anomaly_zscore" -> (tsAnomalyZscore _),
    "ts_ohlc" -> (tsOhlc _),
    "ts_ewma" -> (tsEwma _),
    "ts_interpolate" -> (tsInterpolate _),
    "dedup_fuzzy" -> (dedupFuzzy _),
    "sample_split" -> (sampleSplit _),
    "window_ntile" -> (windowNtile _),
    "compact_small_files" -> (compactSmallFiles _),
    "agg_moments" -> (aggMoments _),
  )

  val oracle: Map[String, String] = Map(
    // mean/std rounded FIRST; z from the rounded operands; flag from the
    // rounded z — no comparison ever sees an unrounded float
    "ts_anomaly_zscore" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        |           FROM events WHERE value IS NOT NULL),
        |w AS (SELECT event_id, user_id, ts_us, value,
        |        CAST(count(value) OVER win AS BIGINT) AS n_base,
        |        round(avg(value) OVER win, 6) AS mean_r,
        |        round(stddev_samp(value) OVER win, 6) AS std_r
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, value, n_base, mean_r, std_r,
        |       CASE WHEN n_base >= 5 AND std_r > 0
        |            THEN round((value - mean_r) / std_r, 4) END AS z,
        |       coalesce(CASE WHEN n_base >= 5 AND std_r > 0
        |            THEN abs(round((value - mean_r) / std_r, 4)) > 3.0 END, FALSE) AS is_anomaly
        |FROM w ORDER BY event_id""".stripMargin,
    // open/close via deterministic first/last row ranks — values copied,
    // never recomputed, so they hash exactly; only the sum is rounded
    "ts_ohlc" ->
      """WITH e AS (SELECT event_type, event_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY event_type, bucket
        |                           ORDER BY ts_us, event_id) AS ra,
        |        row_number() OVER (PARTITION BY event_type, bucket
        |                           ORDER BY ts_us DESC, event_id DESC) AS rd
        |      FROM e)
        |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
        |       max(CASE WHEN ra = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rd = 1 THEN value END) AS close,
        |       round(sum(value), 6) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    // the bounded self-join is the oracle's form of the ROWS-20 frame;
    // identical weights, closed-form normalizer
    "ts_ewma" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY ts_us, event_id) AS rn FROM e),
        |j AS (SELECT a.user_id, a.event_id, a.ts_us, a.value, a.rn,
        |             sum(b.value * pow(0.7, a.rn - b.rn)) AS num,
        |             count(*) AS n
        |      FROM r a JOIN r b ON a.user_id = b.user_id
        |                       AND b.rn BETWEEN a.rn - 19 AND a.rn
        |      GROUP BY 1, 2, 3, 4, 5)
        |SELECT user_id, event_id, ts_us, value,
        |       round(num / ((1 - pow(0.7, n)) / 0.3), 6) AS ewma
        |FROM j ORDER BY user_id, ts_us, event_id""".stripMargin,
    // bucket means rounded before interpolating; exact integer bucket
    // distances; edges extend flat
    "ts_interpolate" ->
      """WITH e AS (SELECT user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket, value
        |           FROM events WHERE value IS NOT NULL),
        |pb AS (SELECT user_id, bucket, round(avg(value), 6) AS v_raw FROM e GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM pb GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM bounds),
        |f AS (SELECT g.user_id, g.bucket, pb.v_raw
        |      FROM grid g LEFT JOIN pb USING (user_id, bucket)),
        |x AS (SELECT user_id, bucket, v_raw,
        |        last_value(v_raw IGNORE NULLS) OVER wp AS pv,
        |        last_value(CASE WHEN v_raw IS NOT NULL THEN bucket END IGNORE NULLS)
        |          OVER wp AS pbk,
        |        first_value(v_raw IGNORE NULLS) OVER wn AS nv,
        |        first_value(CASE WHEN v_raw IS NOT NULL THEN bucket END IGNORE NULLS)
        |          OVER wn AS nbk
        |      FROM f
        |      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (PARTITION BY user_id ORDER BY bucket
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket, bucket * 3600000000 AS ts_us, v_raw IS NULL AS is_gap,
        |       floor((CASE WHEN v_raw IS NOT NULL THEN v_raw
        |                  WHEN pv IS NULL THEN nv
        |                  WHEN nv IS NULL THEN pv
        |                  ELSE pv + (nv - pv) * CAST(bucket - pbk AS DOUBLE)
        |                                      / CAST(nbk - pbk AS DOUBLE)
        |             END) * 1e6 + 0.5) / 1e6 AS v
        |FROM x ORDER BY user_id, bucket""".stripMargin,
    // same blocks, same cap, same prefix operands — Levenshtein is
    // identically defined in both engines on this ASCII corpus
    "dedup_fuzzy" ->
      """WITH d AS (SELECT doc_id, lang, substr(text, 1, 80) AS prefix,
        |                  substr(text, 1, 8) AS sig, n_chars // 20 AS lb
        |           FROM documents),
        |b AS (SELECT lang, lb, sig, count(*) AS bn FROM d GROUP BY 1, 2, 3),
        |k AS (SELECT d.* FROM d JOIN b USING (lang, lb, sig) WHERE bn BETWEEN 2 AND 50)
        |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |       CAST(levenshtein(a.prefix, c.prefix) AS BIGINT) AS dist
        |FROM k a JOIN k c ON a.lang = c.lang AND a.lb = c.lb AND a.sig = c.sig
        |                 AND a.doc_id < c.doc_id
        |WHERE levenshtein(a.prefix, c.prefix) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "sample_split" ->
      """WITH d AS (SELECT doc_id, source,
        |                  (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100
        |                    AS bucket
        |           FROM documents)
        |SELECT doc_id, source,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM d ORDER BY doc_id""".stripMargin,
    "window_ntile" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |                  ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        |           FROM documents)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(n_chars) AS BIGINT) AS min_chars,
        |       CAST(max(n_chars) AS BIGINT) AS max_chars,
        |       round(avg(n_chars), 6) AS avg_chars
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin,
    // losslessness: the compacted copy must aggregate identically to the
    // source table (counts, distinct ids, char totals per source)
    "compact_small_files" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // identical two-pass rounded-mean centering — see the Spark scaladoc
    "agg_moments" ->
      """WITH m AS (SELECT l_returnflag AS flag, round(avg(l_extendedprice), 6) AS mean_r
        |           FROM lineitem GROUP BY 1),
        |c AS (SELECT l.l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
        |             sum(pow(l.l_extendedprice - m.mean_r, 2)) AS s2,
        |             sum(pow(l.l_extendedprice - m.mean_r, 3)) AS s3,
        |             sum(pow(l.l_extendedprice - m.mean_r, 4)) AS s4,
        |             any_value(m.mean_r) AS mean_r
        |      FROM lineitem l JOIN m ON l.l_returnflag = m.flag GROUP BY 1)
        |SELECT flag, n, mean_r,
        |       round(sqrt(s2 / n), 4) AS std_pop,
        |       round((s3 / n) / pow(s2 / n, 1.5), 5) AS skewness,
        |       round((s4 / n) / pow(s2 / n, 2) - 3, 5) AS kurtosis
        |FROM c ORDER BY flag""".stripMargin,
  )
}
