package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-5 operators (label propagation, rolling median, seasonality
  * profile, trend regression, gzip CSV round trip). Oracle parity runs at
  * the gate (verified at sf0.001/0.01/0.1); these specs pin the LPA
  * rounds against a driver recompute, median frame semantics, profile
  * structure, the regression against closed-form least squares, and the
  * compressed files actually being gzip.
  */
class SeriesBatch3Spec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SeriesQueries.queries(name)(spark, sf)

  test("graph_label_prop matches a driver recompute of 5 majority-vote rounds") {
    val got = AnalyticsQueries.queries("graph_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>")).collect()
    val emb = rows.map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    val seed = rows.map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val ids = emb.keys.toArray.sorted
    // same bucketed ANN edge build as the engine (GraphTestUtil is the
    // third independent implementation beside the plan and the oracle)
    val dirE = GraphTestUtil.annEdges(emb)
    val und = dirE.toSeq.flatMap { case (s, ds) =>
      ds.map(t => (math.min(s, t), math.max(s, t)))
    }.toSet
    val nbrs = ids.map { v =>
      v -> und.collect { case (a, b) if a == v => b; case (a, b) if b == v => a }
    }.toMap
    var labels = seed
    for (_ <- 1 to 5) {
      labels = ids.map { v =>
        val ns = nbrs(v)
        if (ns.isEmpty) v -> labels(v)
        else {
          val counts = ns.toSeq.map(labels).groupBy(identity).view.mapValues(_.size).toSeq
          v -> counts.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }.toMap
    }
    ids.foreach { v =>
      assert(got(v) === ((seed(v), labels(v), seed(v) == labels(v))), s"node $v")
    }
  }

  test("ts_rolling_median: singleton frames echo the value; every median sits inside its frame") {
    val rows = q("ts_rolling_median").collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(1))
    byUser.values.foreach { rs =>
      val ord = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      assert(math.abs(ord.head.getDouble(4) - ord.head.getDouble(3)) < 1e-9,
        "first row's frame is just itself")
      ord.zipWithIndex.foreach { case (r, i) =>
        val frame = ord.slice(math.max(0, i - 10), i + 1).map(_.getDouble(3))
        assert(r.getDouble(4) >= frame.min - 1e-9 && r.getDouble(4) <= frame.max + 1e-9)
        // exact recompute: sorted-frame midpoint with linear interpolation
        val s = frame.sorted
        val exact =
          if (s.length % 2 == 1) s(s.length / 2)
          else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        assert(math.abs(r.getDouble(4) - exact) < 2e-6, s"median at index $i")
      }
    }
  }

  test("ts_peak_hours: shares sum to 1 per type with exactly one maximal peak") {
    val rows = q("ts_peak_hours").collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-3)
      val peaks = rs.filter(_.getBoolean(4))
      assert(peaks.length === 1)
      assert(peaks.head.getLong(2) === rs.map(_.getLong(2)).max)
      assert(rs.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 23))
    }
  }

  test("ts_trend matches closed-form least squares per user") {
    val rows = q("ts_trend").collect()
    assert(rows.nonEmpty)
    val e = Tables.eventsTsUs(spark, sf).filter(col("value").isNotNull)
      .select(col("user_id"), col("ts_us"), col("value")).collect()
      .groupBy(_.getLong(0))
    rows.foreach { r =>
      val pts = e(r.getLong(0)).map(x =>
        (x.getLong(1).toDouble / 3600000000.0 - SeriesQueries.TrendEpochHours, x.getDouble(2)))
      val n = pts.length.toDouble
      val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
      val sxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
      val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val syy = pts.map(p => (p._2 - my) * (p._2 - my)).sum
      val slope = sxy / sxx
      assert(r.getLong(1) === pts.length.toLong)
      assert(math.abs(r.getDouble(2) - slope) < 1e-4, "slope")
      assert(math.abs(r.getDouble(3) - (my - slope * mx)) < 1e-2, "intercept")
      assert(math.abs(r.getDouble(4) - sxy * sxy / (sxx * syy)) < 1e-4, "r2")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("scan_csv_gzip: the files on disk are really gzip members") {
    val tmp = java.nio.file.Files.createTempDirectory("csvgzspec")
    try {
      Tables.tbl(spark, sf, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").option("compression", "gzip").option("header", "false")
        .csv(s"$tmp/docs")
      val files = new java.io.File(s"$tmp/docs").listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(files.nonEmpty)
      files.foreach { f =>
        assert(f.getName.endsWith(".csv.gz"), f.getName)
        val in = new java.io.FileInputStream(f)
        val magic = try { val b = new Array[Byte](2); in.read(b); b } finally in.close()
        assert((magic(0) & 0xff) === 0x1f && (magic(1) & 0xff) === 0x8b,
          s"${f.getName} lacks the gzip magic")
      }
      val back = q("scan_csv_gzip").collect()
      assert(back.length.toLong === Tables.tbl(spark, sf, "documents").count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
