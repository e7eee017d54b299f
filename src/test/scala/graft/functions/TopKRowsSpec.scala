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
