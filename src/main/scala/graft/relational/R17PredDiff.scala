package graft.relational

import graft.core._
import graft.pipeline.AnomalyDetection
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev scratch (r17): hunt the ulp divergence between the fused
  * fitPredict llks and a fresh predict() pass. Not gate surface. */
object R17PredDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val params = AnomalyDetection.Params(
      anomalySensitivity = 2.0, nClusters = 2, quantize = true,
      quantizeType = "simple", eps = 0.2)
    val long = Tables.eventsLong(s, sfDir).withColumnRenamed("user_id", "seq_id")
    val (model, pred) = AnomalyDetection.fitPredict(s, long, params)
    def show(tag: String, v: Array[org.apache.spark.sql.Row]): Unit =
      println(s"=== $tag: " + v.map(_.toString).mkString(" "))
    show("fused pred 127", pred.filter(col("seq_id") === 127).collect())
    show("fresh predict 127", AnomalyDetection.predict(s, model, long)
      .filter(col("seq_id") === 127).collect())

    def densify(df: org.apache.spark.sql.DataFrame) =
      df.repartition(col("seq_id"))
        .sortWithinPartitions(col("seq_id"), col("t"))
        .withColumn("t", (row_number().over(
          Window.partitionBy(col("seq_id")).orderBy(col("t"))) - 1).cast("long"))

    val qP = densify(Quantize.simple(long))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qP.count()
    val base = Llk.scoreAllLong(s, qP, model.library, presort = false)
    show("scoreAllLong(qP) 127", base.filter(col("seq_id") === 127).collect())
    show("scoreAllLong(qP).ckpt 127", Llk.scoreAllLong(s, qP, model.library,
        presort = false).localCheckpoint(true)
      .filter(col("seq_id") === 127).collect())
    // does seq 127 span multiple input batches / what's its length?
    println("=== seq127 len: " + qP.filter(col("seq_id") === 127).count())
    // how many seqs in 127's partition (ObjectHashAggregate fallback is 128 keys)
    val p = qP.select(col("seq_id"), expr("spark_partition_id()").as("p"))
      .filter(col("seq_id") === 127).select(col("p")).distinct().collect()(0).getInt(0)
    println("=== partition of 127: " + p)
    println("=== groups in that partition: " + qP
      .select(col("seq_id"), expr("spark_partition_id()").as("p"))
      .filter(col("p") === p).select(col("seq_id")).distinct().count())
    s.stop()
  }
}
