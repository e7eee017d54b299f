package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SQL-expressible operators from SURVEY.md §2, realized over the
  * driver's TPC-H-ish parquet tables (FIXTURES.md §B) with a DuckDB oracle
  * for each (driver contract, graft.Verify).
  *
  * Conventions that keep the Spark result hash-identical to DuckDB:
  *   - every float produced by an aggregate is `round(x, 6)` on both sides
  *     (raw parquet values pass through un-rounded — they are bit-identical);
  *   - integer outputs are BIGINT on both sides;
  *   - every query ends in a total ORDER BY;
  *   - column names are aliased identically on both sides.
  */
object RelationalQueries {
  import Tables.tbl

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def lineitem(s: SparkSession, d: String) = tbl(s, d, "lineitem")

  private def seqW = Tables.seqWindow

  // ---------------------------------------------------------------- §2.1 sources
  /** reference examples/example0.ipynb cell 0: headerless numeric ingest. */
  private def scanCsvHeaderless(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  /** reference examples/Satellite Analysis.ipynb cell 2: sentinel→NaN→drop. */
  private def scanCsvHeadered(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("value", when(col("value") === lit(-1e31), lit(null)).otherwise(col("value")))
      .filter(col("value").isNotNull) // NOT na.drop: that would also drop NaN, diverging from the IS NOT NULL oracle
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  // ------------------------------------------------------- §2.2 project / filter
  /** reference detection.py:124,140: drop bookkeeping columns. */
  private def projectDropCols(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .drop("l_returnflag", "l_linestatus", "l_shipdate")
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** reference Satellite notebook cells 2,4: positional column slice. */
  private def projectSliceCols(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    li.select(li.columns.slice(0, 4).map(col).toIndexedSeq: _*)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** reference detection.py:365: rows of one cluster. */
  private def filterByCluster(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "customer")
      .filter(col("c_nationkey") === 7)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** reference detection.py:133-136: alphabet_size = max(symbol)+1 (NOT distinct). */
  private def mapAlphabetSize(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg((max(floor(col("value") / 50).cast("long")) + 1).as("alphabet_size"))
      .orderBy(col("user_id"))

  /** reference detection.py:139-140: keep sequences whose alphabet fits the PFSA. */
  private def filterAlphabetCompat(s: SparkSession, d: String): DataFrame =
    mapAlphabetSize(s, d).filter(col("alphabet_size") <= 9).orderBy(col("user_id"))

  /** reference detection.py:613: drop rows with any NULL (explicit isNotNull
    * conjunction, not na.drop, to keep NaN rows like the SQL oracle does). */
  private def filterNotnaRows(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.filter(e.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("props"), Tables.tsUsCol(e).as("ts_us"))
      .orderBy(col("event_id"))
  }

  /** reference detection.py:280: no-quantize path casts to int8. */
  /** int8 narrowing with the REFERENCE's semantics: numpy `.astype(int8)`
    * WRAPS two's-complement (the reference quantizer emits small
    * alphabets, but nothing stops a raw feed from exceeding ±127 — at
    * sf0.1 it does, and a bare ANSI `cast(tinyint)` throws CAST_OVERFLOW
    * in Spark and DuckDB alike; the sf0.1 full-verify sweep caught
    * exactly that). The wrap `((x % 256) + 384) % 256 − 128` is the
    * explicit total form, identical in both engines (both keep the
    * dividend's sign in %). */
  private def mapCastInt8(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        expr("cast(((cast(floor(value / 4) as bigint) % 256) + 384) % 256 - 128 as tinyint)")
          .as("symbol"))
      .orderBy(col("event_id"))

  /** reference Satellite notebook cell 2: sentinel value → null. */
  private def mapSentinelToNull(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        when(col("value") === lit(-1e31), lit(null).cast("double")).otherwise(col("value")).as("value"))
      .orderBy(col("event_id"))

  // ------------------------------------------------------------ §2.3 quantization
  /** reference detection.py:289-292: Δ along time then sign (first Δ := 0). */
  private def quantizeSimple(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("t", (row_number().over(seqW) - 1).cast("long"))
      .withColumn("d", coalesce(col("value") - lag(col("value"), 1).over(seqW), lit(0.0)))
      .select(col("user_id"), col("t"),
        when(col("d") > 0, lit(1L)).otherwise(lit(0L)).as("symbol"))
      .orderBy(col("user_id"), col("t"))

  /** reference detection.py:293-296: diff.fillna(0).diff.fillna(0) then sign. */
  private def quantizeSimpleSecond(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .withColumn("t", (row_number().over(seqW) - 1).cast("long"))
      .withColumn("d1", coalesce(col("value") - lag(col("value"), 1).over(seqW), lit(0.0)))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("t"))
    base
      .withColumn("d2", coalesce(col("d1") - lag(col("d1"), 1).over(w2), lit(0.0)))
      .select(col("user_id"), col("t"),
        when(col("d2") > 0, lit(1L)).otherwise(lit(0L)).as("symbol"))
      .orderBy(col("user_id"), col("t"))
  }

  /** reference detection.py:297-306 + tex/ms.tex:293-294: entropy-max
    * (equal-mass) partition — fitted cutoffs at the (1/8 … 7/8) quantiles,
    * then symbol = #cutoffs below the value (the reference Quantizer is
    * cutoff-based too, detection.py:224-226). Scale shape: one aggregation
    * produces a single 7-value row; the assignment pass is a broadcast
    * nested-loop join + codegen'd when-chain — no global sort, no
    * unpartitioned window. */
  private def quantizeComplex(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val probes = (1 to 7).map(_ / 8.0)
    // EXACT `percentile` exists only for hash-exact DuckDB parity on oracle
    // runs (SURVEY §7.3): its buffer holds one counter per distinct value,
    // memory-unbounded on high-cardinality doubles. The engine path
    // (Quantize.fitComplex, used by AnomalyDetection) fits cutoffs with
    // bounded-memory approxQuantile sketches instead.
    val cuts = e.agg(
      round(expr(s"percentile(value, ${probes.head})"), 6).as("c1"),
      probes.tail.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile(value, $p)"), 6).as(s"c${i + 2}") }: _*)
    val sym = (1 to 7).map(i => when(col("value") > col(s"c$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    e.crossJoin(broadcast(cuts))
      .select(col("event_id"), sym.cast("long").as("symbol"))
      .orderBy(col("event_id"))
  }

  /** reference detection.py:279-280: symbols already discrete, cast only. */
  private def quantizePassthrough(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("tinyint").as("symbol"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // -------------------------------------------------- §2.4 llk-shaped relational
  /** reference detection.py:142-144: left-join scored subset back onto all
    * sequences, missing ⇒ +inf. */
  private def llkRealignFillinf(s: SparkSession, d: String): DataFrame = {
    val per = events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("llk0"))
    val compat = per.filter(col("n") >= 60)
      .select(col("user_id"), round(col("llk0"), 6).as("llk1"))
    events(s, d).select(col("user_id")).distinct()
      .join(compat, Seq("user_id"), "left")
      .select(col("user_id"), coalesce(col("llk1"), lit(Double.PositiveInfinity)).as("llk"))
      .orderBy(col("user_id"))
  }

  /** reference detection.py:320-323 + tex/ms.tex:290-291 (SLD): pairwise
    * sequence divergence from per-sequence feature vectors; self-join. */
  private def distMatrix(s: SparkSession, d: String): DataFrame = {
    val f = events(s, d).groupBy(col("user_id")).agg(
      round(avg(col("value")), 6).as("f1"),
      round(stddev_samp(col("value")), 6).as("f2"),
      round(min(col("value")), 6).as("f3"),
      round(max(col("value")), 6).as("f4"))
    val a = f.alias("a")
    val b = f.alias("b")
    a.join(b, col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
        round(abs(col("a.f1") - col("b.f1")) + abs(col("a.f2") - col("b.f2"))
          + abs(col("a.f3") - col("b.f3")) + abs(col("a.f4") - col("b.f4")), 6).as("dist"))
      .orderBy(col("user_a"), col("user_b"))
  }

  // ------------------------------------------------------------ §2.5 aggregations
  /** reference detection.py:472-499: per-cluster mean + sample std of llk. */
  private def aggLlkStats(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type")).agg(
      round(avg(col("value")), 6).as("llk_mean"),
      round(stddev_samp(col("value")), 6).as("llk_std"))
      .orderBy(col("event_type"))

  /** reference detection.py:342-344. */
  private def aggClusterCounts(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** reference detection.py:341-347: relabel clusters by descending size.
    * The rank runs on the driver over the collected k-row aggregate
    * (k = |event_type|, a domain constant, ~20 — bounded regardless of data
    * size), so no single-partition window exchange exists anywhere in the
    * plan. A constant partition key does NOT work here: Catalyst folds it
    * away and WindowExec still sees an empty partition spec. */
  private def aggRankRelabel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
      .zipWithIndex
      .map { case ((t, _), i) => (t, i.toLong) }
      .toSeq.toDF("event_type", "new_label")
      .orderBy(col("new_label"))
  }

  /** reference detection.py:152: per sequence, cluster with min llk. */
  private def aggArgminClosest(s: SparkSession, d: String): DataFrame = {
    val sc = events(s, d).groupBy(col("user_id"), col("event_type"))
      .agg(round(avg(col("value")), 6).as("llk"))
    sc.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("llk").asc_nulls_last, col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("closest"), col("llk"))
      .orderBy(col("user_id"))
  }

  /** reference detection.py:153-158: cluster → member sequence ids. The
    * member list is emitted as a comma-joined string — a canonical scalar the
    * driver's pandas hash can sort (a raw list column is unhashable there). */
  private def aggGroupbyCollect(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(expr("array_join(transform(sort_array(collect_list(user_id)), x -> cast(x as string)), ',')")
        .as("members"))
      .orderBy(col("event_type"))

  /** reference detection.py:430-442: row-normalized confusion fractions. */
  private def aggConfusionFractions(s: SparkSession, d: String): DataFrame =
    tbl(s, d, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("frac", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy(col("o_orderstatus"))), 6))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("frac"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** SURVEY §2.5 agg_seq_collect: long form → ordered per-sequence array,
    * emitted as a comma-joined decimal(18,6) string (canonical scalar — same
    * rendering in Spark and DuckDB, hashable by the driver's pandas compare). */
  private def aggSeqCollect(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("z"))
      .select(col("user_id"),
        expr("array_join(transform(z, x -> cast(cast(x.value as decimal(18,6)) as string)), ',')").as("vals"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------- §2.6 window / segmentation
  /** reference detection.py:595-613 split_streams: stride windows, size=10,
    * overlap=5 (stride 5), incomplete windows dropped. Scale path: the
    * `sequence`+`explode` expansion bounds the blow-up to ⌈size/stride⌉ = 2×
    * rows, with no global sort and no driver loop. */
  private def windowSegmentBase(s: SparkSession, d: String): DataFrame = {
    val size = 10
    val stride = 5
    events(s, d)
      .withColumn("rn", (row_number().over(seqW) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .withColumn("w", explode(sequence(
        greatest(lit(0L), ceil((col("rn") - lit(size - 1)) / lit(stride.toDouble))),
        floor(col("rn") / lit(stride.toDouble)))))
      .filter(col("w") * stride + size <= col("n"))
      .select(col("user_id"), col("w").as("win_id"),
        (col("rn") - col("w") * stride).as("pos"), col("value"))
  }

  private def windowSegment(s: SparkSession, d: String): DataFrame =
    windowSegmentBase(s, d).orderBy(col("user_id"), col("win_id"), col("pos"))

  /** reference detection.py:143: key each window by its first element. */
  private def windowFirstVal(s: SparkSession, d: String): DataFrame =
    windowSegmentBase(s, d)
      .filter(col("pos") === 0)
      .select(col("user_id"), col("win_id"), col("value").as("first_val"))
      .orderBy(col("user_id"), col("win_id"))

  // ------------------------------------------------- temporal joins (r6 extensions)
  /** Scale-safe AS-OF join core — each event row picks the most recent
    * reference row at or before its timestamp, per key. Spark has no
    * native ASOF, and the naive key-join + inequality filter is a
    * non-equi join Catalyst can only nest-loop; the distributed shape is
    * UNION the two tagged streams and carry the last reference forward
    * with one `last(ignoreNulls)` window.
    *
    * A window partitioned by the join KEY alone serializes each key into
    * one task's sort — a scale-killer when keys are low-cardinality (the
    * fixture's `event_type` has 5 values; at 100 TB that is ~20 TB per
    * task). So the window partitions by `(key, ts_bucket)` where
    * `ts_bucket = ts div bucketUs`: partition count scales with the time
    * span, task size with data density per bucket (shrink `bucketUs` as
    * density grows; width ≈ span · targetRowsPerTask / N keeps tasks
    * bounded at any corpus size). Bucket heads are then stitched with a
    * BUCKET-COUNT-sized carry pass: per (key, bucket) take the last
    * in-bucket reference, cumulative-max it over the bucket sequence
    * (strictly earlier buckets only), and join the carried reference back
    * on (key, bucket) — that frame has one row per occupied bucket,
    * independent of row density, so AQE broadcasts it at any realistic
    * span.
    *
    * Semantics (pinned against DuckDB's native ASOF JOIN): inclusive
    * match (`event_ts >= ref_ts` — at equal timestamps in-bucket
    * references sort first); callers pre-dedup references to one per
    * (key, ts) so "latest" is well-defined.
    *
    * @param e    events: (event_id, key, ts_us)
    * @param refs references: (key, ts_us, ref_id), deduped per (key, ts)
    */
  private[graft] def asofBucketed(e: DataFrame, refs: DataFrame, key: String,
                                  bucketUs: Long): DataFrame = {
    val eb = e.withColumn("ts_bucket", expr(s"ts_us div $bucketUs"))
    val rb = refs.withColumn("ts_bucket", expr(s"ts_us div $bucketUs"))
    val tagged = eb.select(col(key), col("ts_bucket"), col("ts_us"),
        lit(0).as("is_ref"), col("event_id"),
        lit(null).cast("long").as("ref_id"), lit(null).cast("long").as("ref_ts_us"))
      .unionByName(rb.select(col(key), col("ts_bucket"), col("ts_us"),
        lit(1).as("is_ref"), lit(null).cast("long").as("event_id"),
        col("ref_id"), col("ts_us").as("ref_ts_us")))
    val w = Window.partitionBy(col(key), col("ts_bucket"))
      .orderBy(col("ts_us"), col("is_ref").desc, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = tagged
      .withColumn("r_id_in", last(col("ref_id"), ignoreNulls = true).over(w))
      .withColumn("r_ts_in", last(col("ref_ts_us"), ignoreNulls = true).over(w))
      .filter(col("is_ref") === 0)
    // boundary stitch: latest reference strictly BEFORE each occupied
    // bucket, computed on a frame with one row per (key, bucket) — later
    // buckets hold strictly later timestamps, so max(struct(ts, id)) over
    // preceding rows IS the carried-in reference; max ignores the nulls
    // contributed by ref-free buckets
    val perBucket = rb.groupBy(col(key), col("ts_bucket"))
      .agg(max(struct(col("ts_us"), col("ref_id"))).as("lastref"))
    val cw = Window.partitionBy(col(key)).orderBy(col("ts_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = tagged.select(col(key), col("ts_bucket")).distinct()
      .join(perBucket, Seq(key, "ts_bucket"), "left")
      .withColumn("carried", max(col("lastref")).over(cw))
      .select(col(key), col("ts_bucket"),
        col("carried.ref_id").as("c_id"), col("carried.ts_us").as("c_ts"))
    inBucket.join(carry, Seq(key, "ts_bucket"), "left")
      .withColumn("r_id", coalesce(col("r_id_in"), col("c_id")))
      .withColumn("r_ts", coalesce(col("r_ts_in"), col("c_ts")))
      .select(col("event_id"), col(key), col("ts_us"),
        col("r_id").as("ref_id"), col("r_ts").as("ref_ts_us"),
        (col("ts_us") - col("r_ts")).as("lag_us"))
  }

  /** Shared inputs of the three as-of gate queries: the event stream and
    * its every-50th-event per-type reference stream (deduped to max id per
    * (type, ts) so "latest"/"earliest" are well-defined). */
  private def asofInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val raw = events(s, d)
    val e = raw.select(col("event_id"), col("event_type"),
      Tables.tsUsCol(raw).as("ts_us"))
    val refs = e.filter(col("event_id") % 50 === 0)
      .groupBy(col("event_type"), col("ts_us")).agg(max(col("event_id")).as("ref_id"))
    (e, refs)
  }

  /** One hour, in microseconds — the as-of time-bucket width the gate
    * registers (production sizes it to span · targetRowsPerTask / N). */
  private val AsofBucketUs = 3600L * 1000000L

  /** AS-OF join gate query — every 50th event plays a per-type "threshold
    * update" stream; each event picks the latest update at or before it.
    * Rides [[asofBucketed]] with 1-hour buckets (the fixture spans ~30
    * days → ~720 buckets × 5 types ≈ 3,600 window partitions, vs 5 for
    * the key-only plan this replaces). */
  private def joinAsof(s: SparkSession, d: String): DataFrame = {
    val (e, refs) = asofInputs(s, d)
    asofBucketed(e, refs, "event_type", AsofBucketUs)
      .orderBy(col("event_id"))
  }

  /** The SAME as-of semantics routed through the custom
    * [[graft.plans.AsOfJoin]] LogicalPlan node + injected lowering rule
    * (graft.plans.AsOfJoinPlan) — the declarative-operator surface of the
    * engine; shares join_asof's oracle, so the two routes are pinned to
    * the identical result. */
  private def joinAsofPlan(s: SparkSession, d: String): DataFrame = {
    val (e, refs) = asofInputs(s, d)
    graft.plans.AsOfJoinPlan.asof(e, refs, "event_type", AsofBucketUs)
      .orderBy(col("event_id"))
  }

  /** Per-key EXACT percentiles over the event stream — the distribution
    * summary every monitoring/QA pass computes. `percentile` (exact, with
    * linear interpolation — same rule as DuckDB's `quantile_cont`, which
    * quantize_complex already pins for fp parity) is a single
    * sort-based aggregate per group; at 100 TB the same query swaps in
    * `approx_percentile` (bounded-memory KLL-style sketch, map-side
    * combinable) — the exact form is registered because it is the
    * oracle-checkable one, the approximate form is the same plan shape. */
  private def aggQuantiles(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        count(col("value")).as("n"))
      .orderBy(col("event_type"))

  /** Top-3 events by value per event type — via the bounded
    * [[graft.functions.TopKRows]] aggregate, NOT a rank window: the
    * fixture's 5 event types make `row_number() OVER (PARTITION BY
    * event_type ...)` serialize ~1/5 of the corpus into one task's sort at
    * any scale, while the aggregate keeps O(k) state per group and
    * combines map-side — each input partition contributes ≤ k candidate
    * rows to the shuffle, independent of corpus size. */
  private def aggTopkPerKey(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val agg = ColumnBridge.column(graft.functions.TopKRows(3,
      ColumnBridge.expression(col("value").cast("double")),
      ColumnBridge.expression(col("event_id").cast("long")))
      .toAggregateExpression())
    events(s, d).groupBy(col("event_type")).agg(agg.as("tk"))
      .select(col("event_type"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("event_type"), (col("i") + 1).cast("long").as("rank"),
        col("e.id").as("event_id"), col("e.value").as("value"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** Distinct-user cardinality per event type via MERGEABLE HLL sketches —
    * the sketch family's flagship 100-TB shape: exact distinct-counting
    * needs a full shuffle of the key universe, while sketches aggregate
    * map-side into fixed 2^lgK-byte state and MERGE associatively, so a
    * 1000-executor count is one tiny union pass. Built two-level here
    * (per-shard `hll_sketch_agg` → `hll_union_agg` merge) to exercise the
    * real production path: shard sketches are what an ingest job persists,
    * and re-aggregation (daily → monthly rollups) is a union of stored
    * sketches, never a re-scan. The exact leg (`count(DISTINCT)`) exists
    * only to power the gate verdict — |est − exact| ≤ 5% · exact, ~3σ of
    * the lgK=12 standard error (1.04/√4096 ≈ 1.6%) — and is what the
    * sketch REPLACES in production. The estimate itself stays OUT of the
    * output: accumulation order can shift it a few counts (sparse→dense
    * transitions, spec-measured), so the hash-gated surface is the exact
    * leg + the tolerance verdict, which absorbs that jitter. */
  private def aggDistinctSketch(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val shards = e.withColumn("shard", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = shards.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("n_approx"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("within_5pct"))
      .orderBy(col("event_type"))
  }

  /** SEGMENT-OVERLAP estimation from MERGEABLE HLL sketches — the set
    * OPERATION the sketch family lacked: distinct-audience intersection
    * between every pair of event-type segments via inclusion–exclusion
    * (|A∩B| ≈ est(A) + est(B) − est(A∪B), the union sketch being one
    * native `hll_union` of the two per-segment sketches). The production
    * shape: per-segment sketches are built ONCE (two-level shard merge,
    * map-side-combinable, fixed lgK=12 state) and every pairwise overlap
    * is answered from |segments|² sketch-level math — never a
    * user-universe self-join, which is what the EXACT leg runs
    * (distinct (type,user) self-joined on user) and what a 100-TB
    * audience-overlap matrix cannot afford. Verdict: the estimate lands
    * within 10% + small absolute slack of the exact intersection (three
    * ±1.6% sketches compound); the hash-gated surface is the exact leg +
    * the verdict, keeping accumulation-order jitter out of the hash. */
  private def aggSketchIntersection(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val shards = e.withColumn("shard", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("shard"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val perType = shards.groupBy(col("event_type"))
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
    val pairs = perType.select(col("event_type").as("type_a"), col("sk").as("ska"))
      .join(broadcast(perType.select(col("event_type").as("type_b"), col("sk").as("skb"))),
        col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        (hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
          - hll_sketch_estimate(hll_union(col("ska"), col("skb")))).as("n_inter_est"))
    val tu = e.select(col("event_type"), col("user_id")).distinct()
    val exact = tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id")), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (abs(col("n_inter_est") - coalesce(col("n_exact"), lit(0L))) <=
          greatest(coalesce(col("n_exact"), lit(0L)).cast("double") * 0.10, lit(32.0)))
          .as("within_tol"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Per-key APPROXIMATE percentiles — the bounded-memory swap
    * [[aggQuantiles]] names for 100 TB, registered as its own gate entry
    * with a rank-window verdict instead of value equality (sketch outputs
    * are not value-reproducible across engines; their RANK CONTRACT is).
    * `approx_percentile(..., acc)` guarantees the returned element's rank
    * lies within ±n/acc of p·n; the verdict recomputes each returned
    * value's exact rank interval [count(<v)+1, count(≤v)] — interval, so
    * tie blocks (the -1e31 sentinel swarm) can't false-fail — and checks
    * it intersects [(p−ε)n, (p+ε)n]. The verdict leg is a 15-row
    * broadcast against the corpus + one combinable conditional-count agg;
    * production ships only the sketch pass. */
  private def aggQuantilesApprox(s: SparkSession, d: String): DataFrame = {
    val acc = 1000
    val eps = 1.0 / acc
    val probs = Seq(0.5, 0.9, 0.99)
    val e = events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val approx = e.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(${probs.mkString(", ")}), $acc)").as("ap"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"), posexplode(col("ap")).as(Seq("i", "v")))
      .withColumn("p", element_at(typedLit(probs), col("i").cast("int") + 1))
      .drop("i")
    val ranks = approx
      .join(e.select(col("event_type").as("et"), col("value").as("w")),
        col("event_type") === col("et"), "left")
      .groupBy(col("event_type"), col("p"), col("n"), col("v"))
      .agg(sum(when(col("w") < col("v"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("w") <= col("v"), 1L).otherwise(0L)).as("n_le"))
    ranks
      .select(col("event_type"), col("p"), col("n"),
        (col("n_lt") + 1 <= ceil((col("p") + eps) * col("n")) &&
          col("n_le") >= floor((col("p") - eps) * col("n"))).as("rank_ok"))
      .orderBy(col("event_type"), col("p"))
  }

  /** FORWARD as-of join — each event picks the EARLIEST reference at or
    * after it (the "next scheduled update" shape). Pure reuse: forward
    * as-of over `ts` IS backward as-of over `-ts` (truncating integer
    * division stays monotone on negatives, so bucket order still follows
    * time order), and the backward plan's `lag_us = ts - ref_ts` computed
    * on negated inputs is exactly the forward `lead_us = ref_ts - ts`.
    * Same one-shuffle scale shape as [[joinAsof]]; pinned against
    * DuckDB's native forward ASOF JOIN (`e.ts_us <= r.ts_us`). */
  private def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    val (e, refs) = asofInputs(s, d)
    asofBucketed(
      e.withColumn("ts_us", -col("ts_us")),
      refs.withColumn("ts_us", -col("ts_us")),
      "event_type", AsofBucketUs)
      .select(col("event_id"), col("event_type"), (-col("ts_us")).as("ts_us"),
        col("ref_id"), (-col("ref_ts_us")).as("ref_ts_us"),
        col("lag_us").as("lead_us"))
      .orderBy(col("event_id"))
  }

  /** NEAREST as-of join — each event picks whichever of its backward and
    * forward matches lies closer in time (ties to the backward one, the
    * conventional pandas `merge_asof(direction='nearest')` rule). Pure
    * composition: the two directional plans run as-is and a per-event
    * pick joins them — no new shuffle machinery, each side keeps its
    * time-bucketed scale shape. The oracle composes DuckDB's two native
    * directional ASOF joins with the same CASE. */
  private def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val (e, refs) = asofInputs(s, d)
    val back = asofBucketed(e, refs, "event_type", AsofBucketUs)
      .select(col("event_id"), col("event_type"), col("ts_us"),
        col("ref_id").as("b_id"), col("ref_ts_us").as("b_ts"))
    val fwd = asofBucketed(
      e.withColumn("ts_us", -col("ts_us")),
      refs.withColumn("ts_us", -col("ts_us")), "event_type", AsofBucketUs)
      .select(col("event_id"), col("ref_id").as("f_id"),
        (-col("ref_ts_us")).as("f_ts"))
    back.join(fwd, "event_id")
      .withColumn("b_d", col("ts_us") - col("b_ts"))
      .withColumn("f_d", col("f_ts") - col("ts_us"))
      .withColumn("pick_b",
        col("b_id").isNotNull && (col("f_id").isNull || col("b_d") <= col("f_d")))
      .select(col("event_id"), col("event_type"), col("ts_us"),
        when(col("pick_b"), col("b_id")).otherwise(col("f_id")).as("ref_id"),
        when(col("pick_b"), col("b_ts")).otherwise(col("f_ts")).as("ref_ts_us"),
        when(col("pick_b"), col("b_d")).otherwise(col("f_d")).as("dist_us"))
      .orderBy(col("event_id"))
  }

  /** AS-OF join with a TOLERANCE — pandas `merge_asof(tolerance=...)`
    * parity: a backward match farther than `tol` behind the event is
    * REJECTED (the left row survives with null reference columns, exactly
    * like a no-match). Pure post-projection on the bucketed plan — the
    * match is already the LATEST at-or-before reference, so rejecting it
    * cannot admit an earlier (even farther) one; no new shuffle machinery,
    * the backward plan's scale shape carries over unchanged. */
  private def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val tolUs = 2L * 3600L * 1000000L // 2 h: rejects ~half the fixture's matches
    val (e, refs) = asofInputs(s, d)
    val keep = col("lag_us") <= tolUs
    asofBucketed(e, refs, "event_type", AsofBucketUs)
      .select(col("event_id"), col("event_type"), col("ts_us"),
        when(keep, col("ref_id")).as("ref_id"),
        when(keep, col("ref_ts_us")).as("ref_ts_us"),
        when(keep, col("lag_us")).as("lag_us"))
      .orderBy(col("event_id"))
  }

  /** Tier count for [[rangeBuckets]]/[[rangeEventProbes]]: the smallest T
    * such that `baseUs · 4^(T−1)` covers `maxLenUs` — T grows as
    * log₄(maxLen/base), so even a year-long interval over a 15-minute
    * base costs 9 tiers. */
  private[graft] def rangeTiers(baseUs: Long, maxLenUs: Long): Int = {
    var t = 1
    while (baseUs * (1L << (2 * (t - 1))) < maxLenUs && t < 31) t += 1
    t
  }

  /** Interval side of the tiered range join: each interval is assigned the
    * SMALLEST tier whose bucket width (`baseUs · 4^tier`) covers its
    * length, so it explodes to AT MOST 2 bucket rows — the capped
    * per-interval fan-out a heavy-tailed length distribution needs (a
    * single-width bucketization explodes a long interval to len/width
    * rows). */
  private[graft] def rangeBuckets(iv: DataFrame, baseUs: Long, tiers: Int): DataFrame = {
    val len = col("end_us") - col("start_us")
    val tierCol = (0 until tiers - 1).foldRight(lit(tiers - 1)) { (t, rest) =>
      when(len <= lit(baseUs * (1L << (2 * t))), lit(t)).otherwise(rest)
    }
    iv.withColumn("tier", tierCol)
      .withColumn("width", expr(s"shiftleft(CAST($baseUs AS BIGINT), 2 * tier)"))
      .withColumn("bucket", explode(array_distinct(
        array(expr("start_us div width"), expr("end_us div width")))))
      .drop("width")
  }

  /** Event side: one probe row per tier (bucket = ts at that tier's
    * width) — per-event fan-out is the tier count, logarithmic in the
    * length spread, never data-sized. */
  private[graft] def rangeEventProbes(e: DataFrame, baseUs: Long, tiers: Int): DataFrame =
    e.withColumn("tier", explode(lit((0 until tiers).toArray)))
      .withColumn("bucket",
        expr(s"ts_us div shiftleft(CAST($baseUs AS BIGINT), 2 * tier)"))

  /** RANGE (interval-containment) join — events against per-type intervals
    * of MIXED lengths (every 50th event opens a window of 15 min – 4 h,
    * deterministically from its id), aggregated per interval. The naive
    * `ts BETWEEN start AND end` join is a non-equi join Spark nest-loops;
    * the distributed shape bucketizes time in TIERS of geometric widths
    * (base 15 min, ×4 per tier): an interval lands in the smallest tier
    * covering its length (≤ 2 bucket rows — [[rangeBuckets]]), an event
    * probes one bucket per tier ([[rangeEventProbes]]), and the join is a
    * plain (key, tier, bucket) EQUI-join with exact containment as a
    * post-filter. Shuffle volume is O(2·intervals + tiers·events) — both
    * caps hold under heavy-tailed interval lengths, where a single-width
    * scheme pays len/width rows per long interval. A (interval, event)
    * pair meets in at most one (tier, bucket), so no dedup is needed. */
  private def joinRange(s: SparkSession, d: String): DataFrame = {
    val baseUs = 900L * 1000000L // 15 min
    val raw = events(s, d)
    val e = raw.select(col("event_id"), col("event_type"),
      Tables.tsUsCol(raw).as("ts_us"))
    val iv = e.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("interval_id"), col("event_type"),
        col("ts_us").as("start_us"),
        expr(s"ts_us + (1 + (event_id div 50) % 16) * $baseUs").as("end_us"))
    // one 1-row agg sizes the tier ladder to the actual length spread
    val maxLen = iv.agg(max(col("end_us") - col("start_us"))).head() match {
      case r if r.isNullAt(0) => baseUs
      case r => r.getLong(0)
    }
    val tiers = rangeTiers(baseUs, maxLen)
    val matched = rangeBuckets(iv, baseUs, tiers)
      .join(rangeEventProbes(e, baseUs, tiers), Seq("event_type", "tier", "bucket"))
      .filter(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_id"),
        max(col("event_id")).as("last_id"))
    iv.select(col("interval_id"), col("event_type"))
      .join(matched, Seq("interval_id"), "left")
      .select(col("interval_id"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("first_id"), col("last_id"))
      .orderBy(col("interval_id"))
  }

  /** Gap-based sessionization — the log-pipeline primitive: a user's
    * events split into sessions wherever the gap from the previous event
    * exceeds 30 minutes, then aggregate per session. ONE user-partitioned
    * window (lag → session-start flags → running sum = session index) plus
    * one (user, session)-keyed aggregate; all integer µs arithmetic.
    * Parallelism unit = the user, the natural key for clickstream-scale
    * data (billions of users, bounded per-user history). */
  private def windowSessionize(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val raw = events(s, d)
    val e = raw.select(col("user_id"), col("event_id"),
      Tables.tsUsCol(raw).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("ts_us"), 1).over(w)
    e.withColumn("new_s",
        when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  // -------------------------------------------------------- §2.9 anomaly decision
  /** reference detection.py:147-149: anomalous iff llk_i > mean_i + k·std_i
    * for EVERY cluster i (sensitivity k = 1); missing (seq,cluster) scores
    * realigned to +inf per detection.py:142-144. */
  private def predictAnomaly(s: SparkSession, d: String): DataFrame = {
    val sc = events(s, d).groupBy(col("user_id"), col("event_type"))
      .agg(round(avg(col("value")), 6).as("llk"))
    val bounds = sc.groupBy(col("event_type"))
      .agg(round(avg(col("llk")) + stddev_samp(col("llk")), 6).as("bound"))
    val users = events(s, d).select(col("user_id")).distinct()
    val types = events(s, d).select(col("event_type")).distinct()
    users.crossJoin(types)
      .join(sc, Seq("user_id", "event_type"), "left")
      .withColumn("llk", coalesce(col("llk"), lit(Double.PositiveInfinity)))
      .join(bounds, Seq("event_type"))
      .groupBy(col("user_id"))
      .agg(bool_and(col("llk") > col("bound")).as("is_anomaly"))
      .orderBy(col("user_id"))
  }

  // ------------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_csv_headerless" -> (scanCsvHeaderless _),
    "scan_csv_headered" -> (scanCsvHeadered _),
    "project_drop_cols" -> (projectDropCols _),
    "project_slice_cols" -> (projectSliceCols _),
    "filter_by_cluster" -> (filterByCluster _),
    "map_alphabet_size" -> (mapAlphabetSize _),
    "filter_alphabet_compat" -> (filterAlphabetCompat _),
    "filter_notna_rows" -> (filterNotnaRows _),
    "map_cast_int8" -> (mapCastInt8 _),
    "map_sentinel_to_null" -> (mapSentinelToNull _),
    "quantize_simple" -> (quantizeSimple _),
    "quantize_simple_second" -> (quantizeSimpleSecond _),
    "quantize_complex" -> (quantizeComplex _),
    "quantize_passthrough" -> (quantizePassthrough _),
    "llk_realign_fillinf" -> (llkRealignFillinf _),
    "dist_matrix" -> (distMatrix _),
    "agg_llk_stats" -> (aggLlkStats _),
    "agg_cluster_counts" -> (aggClusterCounts _),
    "agg_rank_relabel" -> (aggRankRelabel _),
    "agg_argmin_closest" -> (aggArgminClosest _),
    "agg_groupby_collect" -> (aggGroupbyCollect _),
    "agg_confusion_fractions" -> (aggConfusionFractions _),
    "agg_seq_collect" -> (aggSeqCollect _),
    "window_segment" -> (windowSegment _),
    "window_first_val" -> (windowFirstVal _),
    "agg_quantiles" -> (aggQuantiles _),
    "agg_quantiles_approx" -> (aggQuantilesApprox _),
    "agg_distinct_sketch" -> (aggDistinctSketch _),
    "agg_sketch_intersection" -> (aggSketchIntersection _),
    "agg_topk_per_key" -> (aggTopkPerKey _),
    "join_asof" -> (joinAsof _),
    "join_asof_plan" -> (joinAsofPlan _),
    "join_asof_forward" -> (joinAsofForward _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_range" -> (joinRange _),
    "window_sessionize" -> (windowSessionize _),
    "predict_anomaly" -> (predictAnomaly _),
  )

  private val oracleBase: Map[String, String] = Map(
    // DuckDB's NATIVE ASOF JOIN is the oracle for the union+window
    // implementation — inclusive match (e.ts >= r.ts), refs pre-deduped to
    // one per (type, ts) on both engines so "latest" is well-defined
    "join_asof" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |refs AS (SELECT event_type, ts_us, max(event_id) AS ref_id
        |         FROM e WHERE event_id % 50 = 0 GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.ts_us, r.ref_id, r.ts_us AS ref_ts_us,
        |       e.ts_us - r.ts_us AS lag_us
        |FROM e ASOF LEFT JOIN refs r
        |  ON e.event_type = r.event_type AND e.ts_us >= r.ts_us
        |ORDER BY e.event_id""".stripMargin,
    // same interpolation rule both engines; round(…, 6) as quantize_complex
    "agg_quantiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90,
        |       round(quantile_cont(value, 0.99), 6) AS p99,
        |       CAST(count(value) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // verdict-grid oracles for the sketch family: the estimates themselves
    // are not cross-engine reproducible, so DuckDB recomputes the exact
    // legs and pins the verdicts as literal TRUE (CAST on the VALUES
    // literals: DuckDB types bare 0.5 as DECIMAL, which would hash-diverge
    // from Spark's double)
    "agg_distinct_sketch" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |       TRUE AS within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact pairwise distinct-audience intersections + the sketch verdict
    // as a literal TRUE (the estimate itself stays out of the hash)
    "agg_sketch_intersection" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |tt AS (SELECT DISTINCT event_type FROM events),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |          FROM tt a JOIN tt b ON a.event_type < b.event_type),
        |inter AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |                 CAST(count(*) AS BIGINT) AS n
        |          FROM tu x JOIN tu y ON x.user_id = y.user_id
        |                             AND x.event_type < y.event_type
        |          GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, CAST(coalesce(i.n, 0) AS BIGINT) AS n_exact,
        |       TRUE AS within_tol
        |FROM pairs p LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
        |ORDER BY p.type_a, p.type_b""".stripMargin,
    "agg_quantiles_approx" ->
      """SELECT e.event_type, p.p, CAST(count(e.value) AS BIGINT) AS n,
        |       TRUE AS rank_ok
        |FROM events e
        |CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
        |                   (CAST(0.99 AS DOUBLE))) AS p(p)
        |WHERE e.value IS NOT NULL
        |GROUP BY e.event_type, p.p ORDER BY e.event_type, p.p""".stripMargin,
    // value comparisons only (no arithmetic), so stored doubles hash
    // exactly; ties pinned by event_id
    "agg_topk_per_key" ->
      """SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, value
        |FROM (SELECT event_type, event_id, value,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY value DESC, event_id) AS rank
        |      FROM events WHERE value IS NOT NULL)
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    // native ASOF + the same tolerance CASE on all three reference columns
    "join_asof_tolerance" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |refs AS (SELECT event_type, ts_us, max(event_id) AS ref_id
        |         FROM e WHERE event_id % 50 = 0 GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.ts_us,
        |       CASE WHEN e.ts_us - r.ts_us <= 7200000000 THEN r.ref_id END AS ref_id,
        |       CASE WHEN e.ts_us - r.ts_us <= 7200000000 THEN r.ts_us END AS ref_ts_us,
        |       CASE WHEN e.ts_us - r.ts_us <= 7200000000 THEN e.ts_us - r.ts_us END AS lag_us
        |FROM e ASOF LEFT JOIN refs r
        |  ON e.event_type = r.event_type AND e.ts_us >= r.ts_us
        |ORDER BY e.event_id""".stripMargin,
    // both native directional ASOF joins composed with the same
    // nearest-pick CASE (ties to backward)
    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |refs AS (SELECT event_type, ts_us, max(event_id) AS ref_id
        |         FROM e WHERE event_id % 50 = 0 GROUP BY 1, 2),
        |b AS (SELECT e.event_id, r.ref_id AS b_id, r.ts_us AS b_ts
        |      FROM e ASOF LEFT JOIN refs r
        |        ON e.event_type = r.event_type AND e.ts_us >= r.ts_us),
        |f AS (SELECT e.event_id, r.ref_id AS f_id, r.ts_us AS f_ts
        |      FROM e ASOF LEFT JOIN refs r
        |        ON e.event_type = r.event_type AND e.ts_us <= r.ts_us)
        |SELECT e.event_id, e.event_type, e.ts_us,
        |       CASE WHEN pick_b THEN b_id ELSE f_id END AS ref_id,
        |       CASE WHEN pick_b THEN b_ts ELSE f_ts END AS ref_ts_us,
        |       CASE WHEN pick_b THEN e.ts_us - b_ts ELSE f_ts - e.ts_us END AS dist_us
        |FROM e
        |JOIN (SELECT b.event_id, b_id, b_ts, f_id, f_ts,
        |        b_id IS NOT NULL AND (f_id IS NULL
        |          OR e2.ts_us - b_ts <= f_ts - e2.ts_us) AS pick_b
        |      FROM b JOIN f USING (event_id) JOIN e e2 USING (event_id)) p
        |  USING (event_id)
        |ORDER BY e.event_id""".stripMargin,
    // the forward direction, against DuckDB's native forward ASOF (<=)
    "join_asof_forward" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |refs AS (SELECT event_type, ts_us, max(event_id) AS ref_id
        |         FROM e WHERE event_id % 50 = 0 GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.ts_us, r.ref_id, r.ts_us AS ref_ts_us,
        |       r.ts_us - e.ts_us AS lead_us
        |FROM e ASOF LEFT JOIN refs r
        |  ON e.event_type = r.event_type AND e.ts_us <= r.ts_us
        |ORDER BY e.event_id""".stripMargin,
    "window_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |m AS (SELECT user_id, event_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |x AS (SELECT user_id, ts_us,
        |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |             - 1 AS BIGINT) AS session_idx
        |      FROM m)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts_us) AS start_us, max(ts_us) AS end_us,
        |       max(ts_us) - min(ts_us) AS duration_us
        |FROM x GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,
    // the inequality join DuckDB runs directly is the oracle for the
    // bucketized equi-join implementation
    "join_range" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |iv AS (SELECT event_id AS interval_id, event_type, ts_us AS start_us,
        |              ts_us + (1 + (event_id // 50) % 16) * 900000000 AS end_us
        |       FROM e WHERE event_id % 50 = 0)
        |SELECT i.interval_id, i.event_type,
        |       CAST(count(e.event_id) AS BIGINT) AS n_events,
        |       min(e.event_id) AS first_id, max(e.event_id) AS last_id
        |FROM iv i LEFT JOIN e ON e.event_type = i.event_type
        |                     AND e.ts_us BETWEEN i.start_us AND i.end_us
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "scan_csv_headerless" ->
      "SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL ORDER BY event_id",
    "scan_csv_headered" ->
      """SELECT event_id, user_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type,
        |         CASE WHEN value = -1e31 THEN NULL ELSE value END AS value FROM events)
        |WHERE value IS NOT NULL ORDER BY event_id""".stripMargin,
    "project_drop_cols" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "project_slice_cols" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "filter_by_cluster" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_nationkey = 7 ORDER BY c_custkey",
    "map_alphabet_size" ->
      """SELECT user_id, max(CAST(floor(value / 50) AS BIGINT)) + 1 AS alphabet_size
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "filter_alphabet_compat" ->
      """SELECT user_id, max(CAST(floor(value / 50) AS BIGINT)) + 1 AS alphabet_size
        |FROM events GROUP BY user_id
        |HAVING max(CAST(floor(value / 50) AS BIGINT)) + 1 <= 9 ORDER BY user_id""".stripMargin,
    "filter_notna_rows" ->
      """SELECT event_id, user_id, event_type, value, props, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
        |  AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    // numpy-wrap narrowing — both engines' % keeps the dividend's sign
    "map_cast_int8" ->
      """SELECT event_id,
        |       CAST(((CAST(floor(value / 4) AS BIGINT) % 256) + 384) % 256 - 128 AS TINYINT) AS symbol
        |FROM events ORDER BY event_id""".stripMargin,
    "map_sentinel_to_null" ->
      """SELECT event_id, CASE WHEN value = -1e31 THEN NULL ELSE value END AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "quantize_simple" ->
      """SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS t,
        |       CAST(CASE WHEN coalesce(value - lag(value) OVER w, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS symbol
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, t""".stripMargin,
    "quantize_simple_second" ->
      """WITH b AS (
        |  SELECT user_id, CAST(row_number() OVER w - 1 AS BIGINT) AS t,
        |         coalesce(value - lag(value) OVER w, 0) AS d1
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, t,
        |       CAST(CASE WHEN coalesce(d1 - lag(d1) OVER w2, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS symbol
        |FROM b WINDOW w2 AS (PARTITION BY user_id ORDER BY t)
        |ORDER BY user_id, t""".stripMargin,
    "quantize_complex" ->
      """WITH c AS (
        |  SELECT round(quantile_cont(value, 0.125), 6) AS c1, round(quantile_cont(value, 0.25), 6) AS c2,
        |         round(quantile_cont(value, 0.375), 6) AS c3, round(quantile_cont(value, 0.5), 6) AS c4,
        |         round(quantile_cont(value, 0.625), 6) AS c5, round(quantile_cont(value, 0.75), 6) AS c6,
        |         round(quantile_cont(value, 0.875), 6) AS c7
        |  FROM events)
        |SELECT event_id,
        |       CAST((value > c1)::INT + (value > c2)::INT + (value > c3)::INT + (value > c4)::INT
        |          + (value > c5)::INT + (value > c6)::INT + (value > c7)::INT AS BIGINT) AS symbol
        |FROM events, c ORDER BY event_id""".stripMargin,
    "quantize_passthrough" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS TINYINT) AS symbol
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "llk_realign_fillinf" ->
      """WITH per AS (SELECT user_id, count(*) AS n, avg(value) AS llk0 FROM events GROUP BY user_id),
        |compat AS (SELECT user_id, round(llk0, 6) AS llk1 FROM per WHERE n >= 60),
        |allu AS (SELECT DISTINCT user_id FROM events)
        |SELECT a.user_id, coalesce(c.llk1, CAST('infinity' AS DOUBLE)) AS llk
        |FROM allu a LEFT JOIN compat c ON a.user_id = c.user_id
        |ORDER BY a.user_id""".stripMargin,
    "dist_matrix" ->
      """WITH f AS (SELECT user_id, round(avg(value), 6) AS f1, round(stddev(value), 6) AS f2,
        |                  round(min(value), 6) AS f3, round(max(value), 6) AS f4
        |           FROM events GROUP BY user_id)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |       round(abs(a.f1 - b.f1) + abs(a.f2 - b.f2) + abs(a.f3 - b.f3) + abs(a.f4 - b.f4), 6) AS dist
        |FROM f a, f b WHERE a.user_id < b.user_id
        |ORDER BY user_a, user_b""".stripMargin,
    "agg_llk_stats" ->
      """SELECT event_type, round(avg(value), 6) AS llk_mean, round(stddev(value), 6) AS llk_std
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_cluster_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "agg_rank_relabel" ->
      """SELECT event_type, CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) - 1 AS BIGINT) AS new_label
        |FROM events GROUP BY event_type ORDER BY new_label""".stripMargin,
    "agg_argmin_closest" ->
      """WITH s AS (SELECT user_id, event_type, round(avg(value), 6) AS llk
        |           FROM events GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type AS closest, llk,
        |             row_number() OVER (PARTITION BY user_id ORDER BY llk, event_type) AS rn FROM s)
        |SELECT user_id, closest, llk FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "agg_groupby_collect" ->
      """SELECT event_type, string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id) AS members
        |FROM (SELECT DISTINCT event_type, user_id FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_confusion_fractions" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority,
        |       round(n * 1.0 / sum(n) OVER (PARTITION BY o_orderstatus), 6) AS frac
        |FROM c ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "agg_seq_collect" ->
      """SELECT user_id,
        |       string_agg(CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR), ',' ORDER BY ts, event_id) AS vals
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_segment" ->
      """WITH base AS (
        |  SELECT user_id, value,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |ex AS (SELECT user_id, value, rn, n,
        |              unnest(generate_series(CAST(greatest(0, ceil((rn - 9) / 5.0)) AS BIGINT),
        |                                     CAST(floor(rn / 5.0) AS BIGINT))) AS w
        |       FROM base)
        |SELECT user_id, w AS win_id, rn - w * 5 AS pos, value
        |FROM ex WHERE w * 5 + 10 <= n
        |ORDER BY user_id, win_id, pos""".stripMargin,
    "window_first_val" ->
      """WITH base AS (
        |  SELECT user_id, value,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |ex AS (SELECT user_id, value, rn, n,
        |              unnest(generate_series(CAST(greatest(0, ceil((rn - 9) / 5.0)) AS BIGINT),
        |                                     CAST(floor(rn / 5.0) AS BIGINT))) AS w
        |       FROM base)
        |SELECT user_id, w AS win_id, value AS first_val
        |FROM ex WHERE w * 5 + 10 <= n AND rn - w * 5 = 0
        |ORDER BY user_id, win_id""".stripMargin,
    "predict_anomaly" ->
      """WITH s AS (SELECT user_id, event_type, round(avg(value), 6) AS llk
        |           FROM events GROUP BY user_id, event_type),
        |b AS (SELECT event_type, round(avg(llk) + stddev(llk), 6) AS bound FROM s GROUP BY event_type),
        |u AS (SELECT DISTINCT user_id FROM events),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |x AS (SELECT u.user_id, ty.event_type, coalesce(s.llk, CAST('infinity' AS DOUBLE)) AS llk
        |      FROM u CROSS JOIN ty
        |      LEFT JOIN s ON s.user_id = u.user_id AND s.event_type = ty.event_type)
        |SELECT x.user_id, bool_and(x.llk > b.bound) AS is_anomaly
        |FROM x JOIN b ON x.event_type = b.event_type
        |GROUP BY x.user_id ORDER BY x.user_id""".stripMargin,
  )

  /** join_asof_plan runs the SAME semantics through the custom
    * [[graft.plans.AsOfJoin]] logical node — one oracle, two routes. */
  val oracle: Map[String, String] =
    oracleBase + ("join_asof_plan" -> oracleBase("join_asof"))
}
