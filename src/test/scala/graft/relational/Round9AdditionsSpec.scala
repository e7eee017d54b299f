package graft.relational

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral evidence for the round's additions beyond the value-hash
  * oracles: graph_components vs an independent union-find over the
  * GraphTestUtil-recomputed edge set, ts_stl_decompose's additive
  * identity, embed_quantize_binary's bit-level decode, and
  * dq_volume_anomaly's z-score invariants. */
class Round9AdditionsSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val embMap: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("graph_components equals an independent union-find over the recomputed ANN edges") {
    val edges = GraphTestUtil.annEdges(embMap)
    val parent = scala.collection.mutable.Map(embMap.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    // always point the LARGER root at the smaller: a tree's root only ever
    // decreases, so the terminal root is the component minimum — the same
    // labeling contract as Components.minLabel
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for ((s, ds) <- edges; dd <- ds) union(s, dd)
    val expected = embMap.keys.map(k => k -> find(k)).toMap
    val sizes = expected.values.toSeq.groupBy(identity).map { case (c, m) => c -> m.size }
    val rows = AnalyticsQueries.queries("graph_components")(spark, sf).collect()
    assert(rows.length === embMap.size)
    rows.foreach { r =>
      val (id, comp) = (r.getLong(0), r.getLong(1))
      assert(comp === expected(id), s"node $id component")
      assert(r.getLong(2) === sizes(comp).toLong, s"component $comp size")
      assert(r.getBoolean(3) === (id == comp))
    }
  }

  test("ts_stl_decompose: n = trend + seasonal + resid; seasonal is phase-constant") {
    val rows = SeriesQueries.queries("ts_stl_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    var full = 0
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        full += 1
        val err = r.getLong(3).toDouble - (r.getDouble(4) + r.getDouble(5) + r.getDouble(6))
        assert(math.abs(err) < 5e-6, s"additive identity broke by $err at ${r.getString(0)}/${r.getLong(1)}")
      } else assert(r.isNullAt(6), "resid must be NULL exactly where trend is")
    }
    assert(full > 0, "interior hours must carry a full 25-hour trend window")
    assert(full < rows.length, "series edges must carry honest NULL trend")
    rows.filter(!_.isNullAt(5))
      .groupBy(r => (r.getString(0), r.getLong(2)))
      .foreach { case (k, rs) =>
        assert(rs.map(_.getDouble(5)).distinct.length === 1,
          s"seasonal must be a pure function of (type, hour-of-day) at $k")
      }
  }

  test("embed_quantize_binary: packed words decode to the sign pattern; probe grid bounded") {
    val rows = EmbedQueries.queries("embed_quantize_binary")(spark, sf).collect()
    assert(rows.length === embMap.size)
    rows.take(50).foreach { r =>
      val words = r.getString(1).split(",").map(_.toLong)
      val v = embMap(r.getLong(0))
      v.indices.foreach { i =>
        val bit = (words(i / 32) >> (i % 32)) & 1L
        assert((bit == 1L) === (v(i) >= 0), s"bit $i of vec ${r.getLong(0)}")
      }
    }
    val probes = rows.filter(!_.isNullAt(2))
    assert(probes.length === 10)
    probes.foreach { r =>
      assert(r.getString(2).split(",").length === 3, "top-3 Hamming neighbors per probe")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 3L)
    }
    assert(rows.count(_.isNullAt(2)) === rows.length - 10)
  }

  test("sample_coreset: greedy k-center invariants against a driver recompute") {
    val rows = EmbedQueries.queries("sample_coreset")(spark, sf).collect()
    assert(rows.length === embMap.size)
    val selected = rows.filter(_.getBoolean(2)).sortBy(_.getLong(3))
    assert(selected.length === 8)
    assert(selected.head.getLong(0) === embMap.keys.min, "seed is the smallest vec_id")
    // independent greedy recompute with the same rounded-distance rule
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Array[Double], b: Array[Double]) =
      r6(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    var chosen = Vector(embMap.keys.min)
    var dmin = embMap.map { case (id, v) => id -> d2(v, embMap(chosen.head)) }
    for (_ <- 2 to 8) {
      val far = dmin.filterNot(kv => chosen.contains(kv._1))
        .minBy { case (id, dd) => (-dd, id) }._1
      chosen :+= far
      dmin = dmin.map { case (id, dd) => id -> math.min(dd, d2(embMap(id), embMap(far))) }
    }
    assert(selected.map(_.getLong(0)).toVector === chosen, "selection order matches")
    rows.foreach(r => assert(math.abs(r.getDouble(1) - dmin(r.getLong(0))) < 1e-9))
    // cover radius is the max residual distance — every selected point is at 0
    selected.foreach(r => assert(r.getDouble(1) === 0.0))
  }

  test("dq_volume_anomaly: per-type z-scores sum to ~0 and the flag matches |z| > 3") {
    val rows = QualityQueries.queries("dq_volume_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val zsum = rs.map(_.getDouble(4)).sum
      assert(math.abs(zsum) < 1e-2, s"population z-scores of $t must cancel, got $zsum")
      rs.foreach(r => assert(r.getBoolean(5) === (math.abs(r.getDouble(4)) > 3.0)))
    }
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length === rows.length)
  }
}
