package graft.functions

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must equal the sort-based answer under any
  * partitioning (map-side partials + buffer merges + serialization across
  * the exchange), with deterministic tie handling. */
class TopKRowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topk(df: DataFrame, k: Int): Seq[(String, Double, Long)] = {
    import org.apache.spark.sql.graft.ColumnBridge
    val agg = ColumnBridge.column(TopKRows(k,
      ColumnBridge.expression(col("value")),
      ColumnBridge.expression(col("id"))).toAggregateExpression())
    df.groupBy(col("key")).agg(agg.as("tk"))
      .select(col("key"), explode(col("tk")).as("e"))
      .select(col("key"), col("e.value"), col("e.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  private def reference(rows: Seq[(String, Double, Long)], k: Int): Seq[(String, Double, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (key, g) =>
      g.sortBy { case (_, v, id) => (-v, id) }.take(k)
    }

  test("matches the sort-based answer on random data across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 5000L).map(i =>
      (s"k${rnd.nextInt(7)}", math.floor(rnd.nextDouble() * 50) / 10.0, i))
    for (parts <- Seq(1, 3, 32)) {
      val df = rows.toDF("key", "value", "id").repartition(parts)
      val got = topk(df, 5).toSet
      val want = reference(rows, 5).toSet
      assert(got == want, s"parts=$parts diverged")
    }
  }

  test("result arrays come back best-first with id-ascending ties") {
    val rows = Seq(
      ("a", 2.0, 10L), ("a", 2.0, 3L), ("a", 2.0, 7L), ("a", 1.0, 1L),
      ("b", 5.0, 2L))
    val got = topk(rows.toDF("key", "value", "id").repartition(4), 3)
      .filter(_._1 == "a")
    assert(got == Seq(("a", 2.0, 3L), ("a", 2.0, 7L), ("a", 2.0, 10L)),
      s"tie order broken: $got")
  }

  test("groups smaller than k return their full membership; nulls are skipped") {
    val df = Seq(
      (Some(1.0), 1L, "a"), (None, 2L, "a"), (Some(3.0), 3L, "a"))
      .toDF("value", "id", "key")
      .select(col("key"), col("value"), col("id"))
    val got = topk(df, 10)
    assert(got == Seq(("a", 3.0, 3L), ("a", 1.0, 1L)), got.toString)
  }

  test("NaN ranks greatest and can never wedge the buffer") {
    // IEEE > would make NaN incomparable: it would fill a slot, sit at
    // the heap root, and reject every later value. The ordering ranks
    // NaN greatest (both engines' ORDER BY DESC agree), id-tied among NaNs
    val rows = Seq(
      ("a", Double.NaN, 9L), ("a", 3.0, 2L), ("a", 10.0, 3L), ("a", 7.0, 4L),
      ("a", Double.NaN, 1L))
    val got = topk(rows.toDF("key", "value", "id").repartition(3), 3)
    assert(got.map(_._3) == Seq(1L, 9L, 3L), s"NaN handling broken: $got")
    assert(got(0)._2.isNaN && got(1)._2.isNaN && got(2)._2 == 10.0)
  }

  test("buffer property: random offers + random buffer merges equal the reference sort") {
    import org.scalacheck.Gen
    def forAll[A](g: Gen[A])(body: A => Unit): Unit =
      graft.PropSampler.forAll(g, seedBase = 0xF00DL, n = 300)(body)
    // values include NaN, infinities, signed zeros, and heavy duplicates
    val vGen = Gen.frequency(
      6 -> Gen.chooseNum(-3.0, 3.0).map(v => math.floor(v * 4) / 4.0),
      1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, -0.0))
    val rowsGen = for {
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, vGen)
    } yield vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
    val kGen = Gen.chooseNum(1, 7)
    forAll(Gen.zip(rowsGen, kGen, Gen.chooseNum(1, 4))) { case (rows, k, nBufs) =>
      // scatter rows round-robin over several buffers, then merge — the
      // partial-aggregation path
      val bufs = Array.fill(nBufs)(new TopKRows.Buffer(k))
      rows.zipWithIndex.foreach { case ((v, id), i) => bufs(i % nBufs).offer(v, id) }
      val merged = bufs.reduce { (a, b) => b.foreach((v, id) => a.offer(v, id)); a }
      val got = merged.sortedBestFirst.toSeq
      // reference order: NaN group first (above +Inf, per both engines'
      // ORDER BY DESC), then value desc, id asc — NaN kept out of the
      // sort KEYS (sentinel group key instead)
      val want = rows.sortBy { case (v, id) =>
        (if (v.isNaN) 0 else 1, if (v.isNaN) 0.0 else -normalize(v), id)
      }.take(k).map { case (v, id) => (bits(v), id) }
      // compare canonical BIT patterns: a specialized tuple compares
      // primitive doubles with IEEE ==, where NaN != NaN
      assert(got.map { case (v, id) => (bits(v), id) } == want,
        s"k=$k bufs=$nBufs rows=$rows:\n got=$got\nwant=$want")
    }
  }

  test("distinctIds: duplicated (value, id) rows equal distinct-then-top-k under any scatter") {
    import org.scalacheck.Gen
    def forAll[A](g: Gen[A])(body: A => Unit): Unit =
      graft.PropSampler.forAll(g, seedBase = 0xD15CL, n = 300)(body)
    // the LSH generator's duplicate profile: each (value, id) appears 1-8
    // times (once per table), values deterministic per id
    val rowsGen = for {
      n <- Gen.chooseNum(0, 25)
      dups <- Gen.listOfN(n, Gen.chooseNum(1, 8))
    } yield dups.zipWithIndex.flatMap { case (d, i) =>
      List.fill(d)((math.floor((i * 37 % 11) * 0.25) / 2.0, i.toLong))
    }
    forAll(Gen.zip(rowsGen, Gen.chooseNum(1, 5), Gen.chooseNum(1, 4))) {
      case (rows, k, nBufs) =>
        val bufs = Array.fill(nBufs)(new TopKRows.Buffer(k, distinctIds = true))
        rows.zipWithIndex.foreach { case ((v, id), i) => bufs(i % nBufs).offer(v, id) }
        val merged = bufs.reduce { (a, b) => b.foreach((v, id) => a.offer(v, id)); a }
        val got = merged.sortedBestFirst.toSeq
        val want = rows.distinct.sortBy { case (v, id) => (-v, id) }.take(k)
        assert(got == want, s"k=$k bufs=$nBufs rows=$rows:\n got=$got\nwant=$want")
    }
  }

  test("distinctIds: without it duplicates occupy slots — the behavior the edge build must avoid") {
    val plain = new TopKRows.Buffer(3)
    Seq((5.0, 1L), (5.0, 1L), (5.0, 1L), (4.0, 2L)).foreach { case (v, id) => plain.offer(v, id) }
    assert(plain.sortedBestFirst.toSeq == Seq((5.0, 1L), (5.0, 1L), (5.0, 1L)),
      "plain buffer keeps duplicates (documented contrast)")
    val dedup = new TopKRows.Buffer(3, distinctIds = true)
    Seq((5.0, 1L), (5.0, 1L), (5.0, 1L), (4.0, 2L)).foreach { case (v, id) => dedup.offer(v, id) }
    assert(dedup.sortedBestFirst.toSeq == Seq((5.0, 1L), (4.0, 2L)))
  }

  /** -0.0 ties 0.0 in the SQL order; NaN canonicalized for set compare. */
  private def normalize(v: Double): Double =
    if (v.isNaN) Double.NaN else if (v == 0.0) 0.0 else v

  private def bits(v: Double): Long =
    java.lang.Double.doubleToLongBits(normalize(v))

  test("the registered query beats the window shape: partial aggregation in-plan") {
    val dir = java.nio.file.Files.createTempDirectory("topkspec").toString
    (0L until 200L).map(i => (i, i * 1000000L, i % 3, s"t${i % 5}", i.toDouble % 17, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = graft.relational.RelationalQueries.queries("agg_topk_per_key")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows") || plan.contains("ObjectHashAggregate"),
      s"no map-side partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"rank window crept back in:\n$plan")
    val rows = q.collect()
    assert(rows.length == 15) // 5 types x top 3
  }
}
