package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-3 analytics operators: CDC merge, TF-IDF, histogram, z-order.
  * Gate oracles pin value parity; these pin the semantic contracts —
  * merge row accounting, tf-idf ranking sanity, histogram mass
  * conservation, and the z-order LOCALITY WIN the hash can't measure. */
class AnalyticsBatch3Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = AnalyticsQueries.queries(name)(spark, sf)

  test("merge_upsert: row accounting — deletes gone, updates bumped, inserts present") {
    val rows = q("merge_upsert").collect()
    val base = Tables.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStatus = rows.groupBy(_.getString(3))
    assert(byStatus("kept").size === base.keys.count(id => id % 10 != 0 && id % 10 != 5))
    assert(byStatus("updated").size === base.keys.count(_ % 10 == 0))
    assert(byStatus("inserted").size === base.keys.count(_ % 10 == 1))
    assert(rows.forall(r => r.getLong(0) % 10 != 5 || r.getLong(0) > 999999),
      "no deleted key survives")
    byStatus("updated").foreach(r =>
      assert(r.getLong(2) === base(r.getLong(0)) + 1000L, "update rule applied"))
    byStatus("inserted").foreach(r =>
      assert(r.getString(1) === "xx" && r.getLong(2) === 7L))
  }

  test("text_tfidf: 5 ranked terms per doc (fewer only for tiny vocabularies), scores descend") {
    val rows = q("text_tfidf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) >= b.getDouble(4))
        case _ =>
      }
    }
    // a corpus-universal term (appears in every doc) has idf 0 and can
    // never outrank a discriminative one
    assert(rows.forall(_.getDouble(4) >= 0.0))
  }

  test("agg_histogram: shares sum to 1 per type, counts conserve the type total") {
    val rows = q("agg_histogram").collect()
    val totals = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getLong(2)).sum === totals(t))
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9))
    }
  }

  test("sort_zorder: z interleave is exact and the layout beats a time sort on box queries") {
    val rows = q("sort_zorder").collect()
    // interleave correctness on a few rows, recomputed in scala
    def morton(u: Long, b: Long): Long =
      (0 until 16).map(i => (((u >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    rows.take(50).foreach(r =>
      assert(r.getLong(3) === morton(r.getLong(1), r.getLong(2)), "Morton bits exact"))

    // locality: chunk the corpus into 32 equal files under (a) z order and
    // (b) pure time order; a (user-range x time-range) box predicate must
    // touch no MORE chunks under z order on average — that is the entire
    // point of the layout
    val n = rows.length
    val chunk = math.max(1, n / 32)
    def chunksTouched(sorted: Array[(Long, Long)], uLo: Long, uHi: Long, bLo: Long, bHi: Long): Int =
      sorted.zipWithIndex
        .filter { case ((u, b), _) => u >= uLo && u <= uHi && b >= bLo && b <= bHi }
        .map(_._2 / chunk).distinct.length
    val zSorted = rows.map(r => (r.getLong(1), r.getLong(2)))
    val tSorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    val users = rows.map(_.getLong(1)).distinct.sorted
    val bLo = rows.map(_.getLong(2)).min
    val boxes = users.take(8).map(u => (u, u, bLo, bLo + 100))
    val zTouch = boxes.map { case (a, b, c, d) => chunksTouched(zSorted, a, b, c, d) }.sum
    val tTouch = boxes.map { case (a, b, c, d) => chunksTouched(tSorted, a, b, c, d) }.sum
    assert(zTouch <= tTouch,
      s"z-order touched $zTouch chunks vs time-sort $tTouch for user-box queries")
  }
}
