package graft.relational

import graft.core._
import graft.pipeline.AnomalyDetection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r16 optimization round): phase timings for the
  * AnomalyDetection fit/predict path shared by pipeline_fit_predict,
  * multilevel_pipeline, stream_fit_predict, predict_scalar_or_vec and the
  * cluster_* feature sweeps — so optimization aims at the measured phase.
  * Dev-side main, never in the gate.
  *
  * Usage: runMain graft.relational.R16FitProfile <sfDir> [cpus]
  */
object R16FitProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fprof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm-up: one full flagship fit+predict absorbs JVM/codegen/MLlib init
    // (the same warm-up Bench does), so phase timings below are warm
    t("warmup fit+predict (cold)") {
      PipelineQueries.pipelineFitPredict(s, sfDir).count()
    }
    val long = Tables.eventsLong(s, sfDir).withColumnRenamed("user_id", "seq_id")
    val params = AnomalyDetection.Params(
      anomalySensitivity = 2.0, nClusters = 2, quantize = true,
      quantizeType = "simple", eps = 0.2)
    // fit phases, replicated from AnomalyDetection.fit
    val quantized = Quantize.simple(long)
    val q = quantized
      .repartition(col("seq_id")).sortWithinPartitions(col("seq_id"), col("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("quantize+densify+persist")(q.count())
    val alphabetSize = 2
    val feat = t("featuresLong (4 base llk)") {
      val f = Cluster.featuresLong(s, q, alphabetSize, presort = false).cache()
      f.count(); f
    }
    val lbl = t("KMeans assign (k=2)") {
      val l = Cluster.assignFeatures(feat, 2, 42L, None).cache()
      l.count(); l
    }
    // A/B: the same KMeans fit on a coalesced input (RDD jobs are not
    // AQE-coalesced; 32 tiny partitions pay ~25 jobs of task overhead)
    val mAsIs = t("KMeans raw fit (as-is parts)") {
      new org.apache.spark.ml.clustering.KMeans().setK(2).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("raw_label").fit(feat)
    }
    val featC1 = feat.coalesce(1)
    val mC1 = t("KMeans raw fit (coalesce 1)") {
      new org.apache.spark.ml.clustering.KMeans().setK(2).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("raw_label").fit(featC1)
    }
    val ctrA = mAsIs.clusterCenters.map(_.toArray.toSeq).toSeq.sortBy(_.toString)
    val ctrB = mC1.clusterCenters.map(_.toArray.toSeq).toSeq.sortBy(_.toString)
    println(s"[fprof] centers equal = ${ctrA == ctrB}")
    println(s"[fprof] centersA = $ctrA")
    println(s"[fprof] centersB = $ctrB")
    val lib = t("inferAllLong (k=2)") {
      GenESeSS.inferAllLong(s, q.join(lbl, "seq_id"), alphabetSize,
        GenESeSS.Params(eps = 0.2), presort = false)
    }
    // attribution inside inferAllLong
    val labeledQ = q.join(lbl, "seq_id")
    val L = GenESeSS.contextLength(alphabetSize, 0.2, 8)
    t("  sub: ngramCountsLong count") {
      GenESeSS.ngramCountsLong(labeledQ, L).count()
    }
    t("  sub: distinct clusters") {
      labeledQ.select("cluster").distinct().collect()
    }
    t("  sub: inferAllLong again (warm)") {
      GenESeSS.inferAllLong(s, labeledQ, alphabetSize,
        GenESeSS.Params(eps = 0.2), presort = false)
    }
    val ordered = (0 until lib.size).map(lib)
    t("scoreAllLong (reduce pass)") {
      Llk.scoreAllLong(s, q, ordered, presort = false).count()
    }
    t("confusionFractions collect") {
      val llks = Llk.scoreAllLong(s, q, ordered, presort = false)
      Cluster.confusionFractions(llks, lbl).collect()
    }
    t("own-stats scoreAllLong+join") {
      Llk.scoreAllLong(s, q, ordered, presort = false)
        .join(lbl, "seq_id")
        .filter(col("cluster_id") === col("cluster"))
        .groupBy(col("cluster"))
        .agg(avg(col("llk")), stddev_samp(col("llk"))).collect()
    }
    q.unpersist(); feat.unpersist(); lbl.unpersist()
    // end-to-end comparisons, warm
    val model = t("fit end-to-end (warm)")(AnomalyDetection.fit(s, long, params))
    t("predict (warm)")(AnomalyDetection.predict(s, model, long).count())
    t("scoreAll array path (warm)") {
      Llk.scoreAll(s, AnomalyDetection.toArrays(Quantize.simple(long)),
        model.library).count()
    }
    t("full pipeline_fit_predict (warm)") {
      PipelineQueries.pipelineFitPredict(s, sfDir).count()
    }
    t("full multilevel (warm)") {
      PipelineQueries.multilevelPipeline(s, sfDir).count()
    }
    t("full cluster_kmeans (warm)") {
      SparkEntryRef.kmeans(s, sfDir)
    }
    s.stop()
  }

  /** indirection so this file compiles without importing graft.SparkEntry
    * (package cycle hygiene) */
  private object SparkEntryRef {
    def kmeans(s: SparkSession, d: String): Unit =
      graft.SparkEntry.queries("cluster_kmeans")(s, d).count()
  }
}
