package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-10 additions, on PLANTED fixtures where
  * the interesting property is forced (the gate's oracle proves
  * cross-engine value parity on the synthetic corpus; these prove the
  * operators detect what they claim to detect). */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("dq_distribution_drift: a planted shift drifts, a stable split does not") {
    // "stable": parity pairs share the value exactly → near-zero PSI.
    // "shift": current (odd) values sit 200 above every baseline value →
    // they all clamp into bin 9 and PSI explodes past 0.2.
    val rows =
      (0L until 1000L).map(i =>
        (i, i * 1000000L, i % 7, "stable", ((i / 2) % 100).toDouble, "{}")) ++
      (1000L until 2000L).map(i =>
        (i, i * 1000000L, i % 7, "shift",
          if (i % 2 == 0) (i % 100).toDouble else 200.0 + (i % 100).toDouble, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("psidrift").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = QualityQueries.queries("dq_distribution_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    val (sb, sc, sPsi, sDrift) = out("stable")
    assert(sb == 500L && sc == 500L && math.abs(sPsi) < 0.05 && !sDrift,
      s"stable split flagged: ${out("stable")}")
    val (hb, hc, hPsi, hDrift) = out("shift")
    assert(hb == 500L && hc == 500L && hPsi > 0.2 && hDrift,
      s"planted shift missed: ${out("shift")}")
  }

  test("similarity_mips: magnitude wins where cosine would not; reduction identity holds") {
    // probe q = e1. Corpus: `aligned` (0.9·e1, cosine 1.0, dot 0.9) vs
    // `long` (2·e1 + 2·e2, cosine 0.707, dot 2.0). MIPS must rank `long`
    // first — the defining difference from the cosine family.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (100L, Array(0.9f, 0.0f, 0.0f, 0.0f), 0),
      (101L, Array(2.0f, 2.0f, 0.0f, 0.0f), 0),
      (102L, Array(0.0f, 0.0f, 0.1f, 0.0f), 0))
    val dir = java.nio.file.Files.createTempDirectory("mips").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = EmbedQueries.queries("similarity_mips")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out((0L, 1L))._1 == 101L, s"rank 1 must be the long vector: $out")
    assert(out((0L, 2L))._1 == 100L, s"rank 2 must be the aligned vector: $out")
    assert(out.values.forall(_._3), "augmentation identity violated somewhere")
    assert(out((0L, 1L))._2 == 2.0 && out((0L, 2L))._2 == 0.9)
  }

  test("embed_matryoshka: signal-in-prefix corpus has perfect truncation recall") {
    // every vector is zero beyond dim 16 → the 16-dim prefix IS the full
    // vector → both rankings identical → recall@3 = 1.0 for every probe
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map { i =>
      val v = Array.fill(20)(0.0f)
      (0 until 16).foreach(j => v(j) = rnd.nextFloat() - 0.5f)
      (i, v, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("mrl").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = EmbedQueries.queries("embed_matryoshka")(spark, dir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"prefix-only corpus must rank identically: ${r.mkString("|")}")
      assert(r.getLong(3) == 3L && r.getDouble(4) == 1.0)
    }
  }

  test("embed_matryoshka: n_hit is the overlap of the two emitted top-3 lists") {
    val out = EmbedQueries.queries("embed_matryoshka")(spark, "/root/testdata/sf0.001")
      .collect()
    out.foreach { r =>
      val full = r.getString(1).split(",").filter(_.nonEmpty).toSet
      val trunc = r.getString(2).split(",").filter(_.nonEmpty).toSet
      assert(r.getLong(3) == full.intersect(trunc).size.toLong, r.mkString("|"))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
