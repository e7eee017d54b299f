package graft.pipeline

import graft.TestSpark
import graft.core.Pfsa
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test per SURVEY.md §5 item 3: train on streams from the
  * M2.cfg ground-truth machine, predict on a mix of M2 and M2_u windows —
  * the M2_u ones must be flagged anomalous, the M2 ones must not. */
class AnomalyDetectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def longForm(rows: Seq[(Long, Array[Byte])]) =
    rows.flatMap { case (id, syms) =>
      syms.zipWithIndex.map { case (s, t) => (id, t.toLong, s.toDouble) }
    }.toDF("seq_id", "t", "value")

  test("fit + predict separates M2 from M2_u (quantize=false, k=1)") {
    val train = longForm((0L until 12L).map(i => i -> Pfsa.m2.sample(4000, seed = 100 + i)))
    val params = AnomalyDetection.Params(
      anomalySensitivity = 3.0, nClusters = 1, quantize = false, eps = 0.05)
    val model = AnomalyDetection.fit(spark, train, params)
    assert(model.library.size == 1)

    val test = longForm(
      (0L until 4L).map(i => i -> Pfsa.m2.sample(4000, seed = 200 + i)) ++
      (4L until 8L).map(i => i -> Pfsa.m2u.sample(4000, seed = 300 + i)))
    val pred = AnomalyDetection.predict(spark, model, test)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 4L).foreach(i => assert(!pred(i), s"M2 seq $i wrongly anomalous"))
    (4L until 8L).foreach(i => assert(pred(i), s"M2_u seq $i not flagged"))
  }

  test("k=2 clustering separates mixed regimes and model round-trips") {
    val train = longForm(
      (0L until 6L).map(i => i -> Pfsa.m2.sample(4000, seed = 400 + i)) ++
      (6L until 12L).map(i => i -> Pfsa.m2u.sample(4000, seed = 500 + i)))
    val params = AnomalyDetection.Params(
      anomalySensitivity = 3.0, nClusters = 2, quantize = false, eps = 0.05)
    val model = AnomalyDetection.fit(spark, train, params)
    assert(model.library.size == 2)

    // both regimes are in-library → nothing anomalous
    val pred = AnomalyDetection.predict(spark, model, train)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2)))
    assert(pred.forall(!_._2))
    // the two regimes map to different closest clusters
    val m2Clusters = pred.filter(_._1 < 6).map(_._3).toSet
    val m2uClusters = pred.filter(_._1 >= 6).map(_._3).toSet
    assert(m2Clusters.size == 1 && m2uClusters.size == 1 && m2Clusters != m2uClusters)

    // persistence round-trip (JSON replaces dill, detection.py:166-243)
    val dir = java.nio.file.Files.createTempDirectory("model").toString
    AnomalyDetection.save(spark, model, dir)
    val loaded = AnomalyDetection.load(spark, dir)
    assert(loaded.library.size == model.library.size)
    assert(loaded.llkMeans.toSeq == model.llkMeans.toSeq)
    assert(loaded.alphabetSize == model.alphabetSize)
    val predLoaded = AnomalyDetection.predict(spark, loaded, train)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(pred.forall { case (id, an, _) => predLoaded(id) == an })
  }

  test("complex quantization path works end-to-end on continuous data") {
    // continuous values: regime A ~ random walk via m2 symbols, regime B via m2u
    def walk(syms: Array[Byte]): Array[Byte] = syms // symbols drive the walk below
    val rnd = new scala.util.Random(7)
    def continuous(syms: Array[Byte]): Seq[Double] = {
      var x = 0.0
      syms.map { s => x += (if (s == 1) 1.0 else -1.0) + rnd.nextGaussian() * 0.1; x }.toSeq
    }
    val train = (0L until 8L).flatMap { i =>
      continuous(Pfsa.m2.sample(3000, 600 + i)).zipWithIndex.map { case (v, t) => (i, t.toLong, v) }
    }.toDF("seq_id", "t", "value")
    val params = AnomalyDetection.Params(
      anomalySensitivity = 3.0, nClusters = 1, quantize = true,
      quantizeType = "simple", eps = 0.05)
    val model = AnomalyDetection.fit(spark, train, params)
    val pred = AnomalyDetection.predict(spark, model, train)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(pred.values.forall(!_), "training regime must not be anomalous to itself")
  }
}
