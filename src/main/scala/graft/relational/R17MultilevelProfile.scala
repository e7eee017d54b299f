package graft.relational

import graft.core._
import graft.pipeline.AnomalyDetection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r17 optimization round): phase timings inside
  * multilevel_pipeline so the optimization aims at the measured phase.
  * Dev-side main, never in the gate.
  *
  * Usage: runMain graft.relational.R17MultilevelProfile <sfDir> [cpus]
  */
object R17MultilevelProfile {
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
      println(f"[mprof] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("warmup fit+predict (cold)") {
      PipelineQueries.pipelineFitPredict(s, sfDir).count()
    }
    val fitParams = AnomalyDetection.Params(
      anomalySensitivity = 2.0, nClusters = 2, quantize = false,
      quantizeType = "simple", eps = 0.2)
    val long = Tables.eventsLong(s, sfDir).withColumnRenamed("user_id", "seq_id")
    val win1 = Segment.windows(Quantize.simple(long), size = 20, overlap = 10,
        "seq_id", "t")
      .select(struct(col("seq_id").as("stream_id"), col("win_id")).as("seq_id"),
        col("pos").as("t"), col("symbol").cast("double").as("value"))
    t("win1 materialize (count)")(win1.count())
    val m1 = t("fit level-1 (k=2)")(AnomalyDetection.fit(s, win1, fitParams))
    val lvl1 = t("predict level-1 + checkpoint") {
      AnomalyDetection.predict(s, m1, win1)
        .select(col("seq_id.stream_id").as("seq_id"), col("seq_id.win_id").as("t"),
          col("closest").cast("double").as("value"))
        .localCheckpoint(true)
    }
    val win2 = Segment.windows(lvl1, size = 4, overlap = 2, "seq_id", "t")
      .select(struct(col("seq_id").as("stream_id"), col("win_id")).as("seq_id"),
        col("pos").as("t"), col("value"))
    t("win2 materialize (count)")(win2.count())
    val m2 = t("fit level-2 (k=2)")(AnomalyDetection.fit(s, win2, fitParams))
    val pred2 = t("predict level-2 (count)") {
      val p = AnomalyDetection.predict(s, m2, win2)
      p.count(); p
    }
    t("feed composition check (count)") {
      win2.select(col("seq_id.stream_id").as("stream_id"),
          col("seq_id.win_id").as("win_id"),
          (col("seq_id.win_id") * 2 + col("t")).as("src_t"), col("value"))
        .join(lvl1.select(col("seq_id").as("stream_id"), col("t").as("src_t"),
          col("value").as("lvl1_value")), Seq("stream_id", "src_t"), "left")
        .groupBy(col("stream_id"), col("win_id"))
        .agg(bool_and(col("lvl1_value").isNotNull && col("value") === col("lvl1_value"))
          .as("input_matches_lvl1"))
        .count()
    }
    t("full multilevel_pipeline (2nd, warm)") {
      PipelineQueries.multilevelPipeline(s, sfDir).count()
    }
    s.stop()
  }
}
