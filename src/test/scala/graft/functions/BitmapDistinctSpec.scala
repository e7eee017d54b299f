package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import org.roaringbitmap.longlong.Roaring64Bitmap

/** The mergeable-exact-distinct contracts: OR-merge idempotence (the
  * retry-safety property), serialization round trip, null skip, and
  * agreement with count(distinct) under hostile partitioning. */
class BitmapDistinctSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark

  test("buffer: idempotent merge, exact cardinality, serde round trip") {
    val agg = BitmapDistinct(ColumnBridge.expression(lit(0L)))
    val a = new Roaring64Bitmap()
    Seq(1L, 5L, 1L, Long.MaxValue, -7L).foreach(a.addLong)
    assert(a.getLongCardinality === 4L)
    val b = agg.deserialize(agg.serialize(a))
    assert(b.getLongCardinality === 4L)
    // merging a copy of itself (a replayed partition) must not change it
    agg.merge(a, b)
    assert(a.getLongCardinality === 4L)
    val c = new Roaring64Bitmap()
    c.addLong(5L); c.addLong(100L)
    agg.merge(a, c)
    assert(a.getLongCardinality === 5L)
  }

  test("aggregate equals count(distinct) with nulls skipped, any partitioning") {
    import spark.implicits._
    val df = Seq[(Option[Long], Int)](
      (Some(1L), 0), (Some(2L), 0), (Some(1L), 1), (None, 1),
      (Some(-3L), 2), (Some(2L), 3), (None, 0)
    ).toDF("id", "p").repartition(7, col("p"))
    val bd = ColumnBridge.column(BitmapDistinct(
      ColumnBridge.expression(col("id"))).toAggregateExpression())
    assert(df.agg(bd.as("n")).head.getLong(0) === 3L)
  }

  test("property: random multisets under random partitionings equal the exact distinct count") {
    import spark.implicits._
    val gen = for {
      n <- org.scalacheck.Gen.choose(0, 300)
      ids <- org.scalacheck.Gen.listOfN(n,
        org.scalacheck.Gen.choose(-1000L, 1000L))
      parts <- org.scalacheck.Gen.choose(1, 13)
    } yield (ids, parts)
    graft.PropSampler.forAll(gen, seedBase = 8841L, n = 20) { case (ids, parts) =>
      val df = ids.toDF("id").repartition(parts)
      val bd = ColumnBridge.column(BitmapDistinct(
        ColumnBridge.expression(col("id"))).toAggregateExpression())
      val got = df.agg(bd.as("n")).head.getLong(0)
      assert(got === ids.distinct.size.toLong,
        s"n=${ids.size} parts=$parts")
    }
  }

  test("graft_bitmap_distinct is callable from plain SQL via the extensions") {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    try {
      s.range(0, 1000).createOrReplaceTempView("ids_bm")
      val n = s.sql(
        "SELECT graft_bitmap_distinct(id % 37) AS n FROM ids_bm").head.getLong(0)
      assert(n === 37L)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
