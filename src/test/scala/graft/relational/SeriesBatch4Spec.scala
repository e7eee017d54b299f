package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-7 operators (streaks, user paths, entropy, Gini). Oracle parity
  * runs at the gate; these specs pin each against a direct driver
  * recompute from the raw events/documents.
  */
class SeriesBatch4Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SeriesQueries.queries(name)(spark, sf)

  private lazy val orderedEvents: Map[Long, Seq[(Long, String)]] =
    Tables.eventsTsUs(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(r => (r.getLong(1), r.getString(3))).toSeq)
      .toMap

  test("window_streaks equals a direct longest-run scan per user") {
    val got = q("window_streaks").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    orderedEvents.foreach { case (u, evs) =>
      // enumerate runs by scanning
      var runs = Vector.empty[(String, Long, Long)] // (type, len, start)
      evs.foreach { case (ts, tp) =>
        runs = runs.lastOption match {
          case Some((t, l, s0)) if t == tp => runs.init :+ ((t, l + 1, s0))
          case _ => runs :+ ((tp, 1L, ts))
        }
      }
      val best = runs.sortBy { case (t, l, s0) => (-l, s0, t) }.head
      assert(got(u) === ((best._1, best._2, best._3)), s"user $u")
    }
  }

  test("agg_user_paths: paths are the users' actual first three events") {
    val rows = q("agg_user_paths").collect()
    assert(rows.nonEmpty)
    val expectPaths = orderedEvents.values
      .map(evs => evs.take(3).map(_._2).mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(expectPaths(r.getString(1)) === r.getLong(2), s"path ${r.getString(1)}")
    }
    // ranks are 1..k and non-increasing in n_users
    val ord = rows.sortBy(_.getLong(0))
    assert(ord.map(_.getLong(0)).toSeq === (1L to ord.length))
    ord.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) >= b.getLong(2))
      case _ =>
    }
  }

  test("agg_entropy_by_key: bounds and exact recompute") {
    val rows = q("agg_entropy_by_key").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      assert(h >= -1e-9 && h <= math.log(r.getLong(1).toDouble) + 1e-9,
        s"entropy outside [0, ln k] for user ${r.getLong(0)}")
    }
    orderedEvents.foreach { case (u, evs) =>
      val counts = evs.groupBy(_._2).values.map(_.size.toDouble)
      val total = evs.size.toDouble
      val h = -counts.map(c => (c / total) * math.log(c / total)).sum
      val row = rows.find(_.getLong(0) == u).get
      assert(math.abs(row.getDouble(3) - h) < 1e-5, s"user $u")
      assert(row.getLong(2) === evs.size.toLong)
    }
  }

  test("agg_gini: exact recompute; uniform lengths give zero") {
    val rows = q("agg_gini").collect()
    val docs = Tables.tbl(spark, sf, "documents")
      .select(col("source"), col("n_chars"), col("doc_id")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val xs = docs(r.getString(0)).sortBy(x => (x.getLong(1), x.getLong(2))).map(_.getLong(1))
      val n = xs.length
      val si = xs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      val g = 2.0 * si / (n.toDouble * xs.sum) - (n + 1.0) / n
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - g) < 1e-6, s"source ${r.getString(0)}")
      assert(r.getDouble(2) >= -1e-9 && r.getDouble(2) < 1.0)
    }
    // closed-form sanity: identical values => G = 0
    val uniform = Seq.fill(10)(100L)
    val si = uniform.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
    val g0 = 2.0 * si / (10.0 * uniform.sum) - 11.0 / 10.0
    assert(math.abs(g0) < 1e-12)
  }
}
