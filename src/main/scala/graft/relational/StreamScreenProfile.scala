package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the ingest-screen decade question: where does
  * stream_decontaminate_fuzzy's wall go at the replicated fixtures —
  * in-stream signature compute, the stream-static band join + memory
  * sink (emitted-hit volume), or the batch verify post-pass? Prints one
  * JSON line per dir with stage timings and the emitted-hit count.
  *
  * Usage: `runMain graft.relational.StreamScreenProfile <sfDir> [...]`.
  * Never invoked by the driver; classpath-only cost. */
object StreamScreenProfile {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamScreenProfile <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the gate-plumbing memory sink collects per-batch results to the
      // driver; at the 100x fixture the emitted band hits exceed the
      // default 1g maxResultSize (the production deployment writes a
      // distributed sink instead — this knob is profile-only)
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    args.foreach { dir =>
      val (_, tMemo) = timed {
        DataPipelineQueries.minhashSigsTables(spark, dir)._2.count()
      }
      val (members, sigs) = DataPipelineQueries.minhashSigsTables(spark, dir)
      val all = members.join(sigs, "set_key").select(col("doc_id"), col("bb"))
      val bench = all.filter(col("doc_id") % 10 === 0)
      val hb = bench.select(col("doc_id").as("bid"),
        posexplode(col("bb")).as(Seq("band", "bucket")))
      val ok = hb.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("sz"))
        .filter(col("sz") <= 256).select(col("band"), col("bucket"))
      val (benchProbe, tProbe) = timed {
        hb.join(ok, Seq("band", "bucket"))
          .select(col("band"), col("bucket"), col("bid"))
          .localCheckpoint(true)
      }
      val schema = spark.read.parquet(s"$dir/documents.parquet").schema
      val src =
        if (new java.io.File(s"$dir/documents.parquet").isDirectory)
          spark.readStream.schema(schema).parquet(s"$dir/documents.parquet")
        else spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
      import graft.text.TextOps
      val arriving = src.filter(col("doc_id") % 10 =!= 0)
        .repartition(cpus.toInt)
        .select(col("doc_id").as("cid"), TextOps.normalized("text").as("norm"))
        .select(col("cid"), TextOps.charShingles("norm", 5).as("sh"))
        .select(col("cid"), TextOps.minhashSigCol(col("sh"), 64).as("sig"))
        .select(col("cid"), TextOps.bandBucketCols(col("sig"), 16, 4).as("bb"))
        .select(col("cid"), posexplode_outer(col("bb")).as(Seq("band", "bucket")))
        .join(broadcast(benchProbe), Seq("band", "bucket"))
        .select(col("cid"), col("bid"))
      // runs the stream into a noop sink; checkpoint temp dir deleted
      // after termination (it held offsets/commits only — nothing a
      // profiler run needs afterwards, and leaving it leaked disk across
      // profiling sweeps)
      def noopRun(): Double = {
        val ckpt = java.nio.file.Files.createTempDirectory("ssp_noop_")
        try {
          val (_, t) = timed {
            val q = arriving.writeStream.format("noop")
              .option("checkpointLocation", ckpt.toString)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          t
        } finally DataPipelineQueries.deleteRecursively(ckpt)
      }
      // GRAFT_SSP_NOOP_ONLY=1: at the 100× fixture the emitted hits
      // exceed what ANY driver-collected sink can hold (30M+ rows OOM a
      // 24g heap) — the screen itself is measured into a noop sink and
      // the driver-bound stages are skipped (prod writes distributed
      // sinks; the memory sink is gate plumbing for gate-sized SFs).
      val noopOnly = sys.env.get("GRAFT_SSP_NOOP_ONLY").contains("1")
      // GRAFT_SSP_SINK=1: the PRODUCTION shape end-to-end — stream the
      // screen's hits into a parquet sink (driver never holds a hit),
      // then run the verify chain as the batch post-pass over the sink
      // files. This is the decade evidence for stream_decontaminate_sink:
      // the shape that completes at the 100× fixture where the memory
      // sink OOMs.
      val sinkMode = sys.env.get("GRAFT_SSP_SINK").contains("1")
      if (sinkMode) {
        val tmp = java.nio.file.Files.createTempDirectory("ssp_sink_")
        try {
          val (_, tSink) = timed {
            val q = arriving.writeStream.format("parquet")
              .option("path", s"$tmp/hits")
              .option("checkpointLocation", s"$tmp/ckpt")
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          val (nHits, tHitCount) = timed {
            spark.read.parquet(s"$tmp/hits").count()
          }
          val allP = members.join(sigs, "set_key")
            .select(col("doc_id"), col("sh"), col("sig"), col("bb"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val benchP = allP.filter(col("doc_id") % 10 === 0)
          val corpP = allP.filter(col("doc_id") % 10 =!= 0)
          val (nOut, tVerdict) = timed {
            DataPipelineQueries.fuzzyScreenVerdict(benchP, corpP,
              spark.read.parquet(s"$tmp/hits"), "ssp_sink_cap").count()
          }
          allP.unpersist()
          println(s"""{"dir":"$dir","t_memo":${fmt(tMemo)},""" +
            s""""t_bench_probe":${fmt(tProbe)},"t_stream_parquet_sink":${fmt(tSink)},""" +
            s""""n_hits":$nHits,"t_hit_count":${fmt(tHitCount)},""" +
            s""""t_verdict_postpass":${fmt(tVerdict)},"n_out":$nOut,""" +
            s""""mode":"parquet_sink"}""")
        } finally DataPipelineQueries.deleteRecursively(tmp)
      } else if (noopOnly) {
        val tNoop0 = noopRun()
        println(s"""{"dir":"$dir","t_memo":${fmt(tMemo)},""" +
          s""""t_bench_probe":${fmt(tProbe)},"t_stream_noop":${fmt(tNoop0)},""" +
          s""""mode":"noop_only"}""")
      } else {
      val (hits, tStream) = timed {
        DataPipelineQueries.runMemorySink(arriving, "ssp_", "append")
      }
      val (nHits, tCount) = timed(hits.count())
      // control 1: the IDENTICAL expression chain in batch mode
      val (nBatch, tBatch) = timed {
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 10 =!= 0)
          .repartition(cpus.toInt)
          .select(col("doc_id").as("cid"), TextOps.normalized("text").as("norm"))
          .select(col("cid"), TextOps.charShingles("norm", 5).as("sh"))
          .select(col("cid"), TextOps.minhashSigCol(col("sh"), 64).as("sig"))
          .select(col("cid"), TextOps.bandBucketCols(col("sig"), 16, 4).as("bb"))
          .select(col("cid"), posexplode_outer(col("bb")).as(Seq("band", "bucket")))
          .join(broadcast(benchProbe), Seq("band", "bucket"))
          .select(col("cid"), col("bid"))
          .count()
      }
      // control 2: the same stream into a noop sink (no driver collect)
      val tNoop = noopRun()
      val (_, tGate) = timed {
        DataPipelineQueries.queries("stream_decontaminate_fuzzy")(spark, dir).count()
      }
      // decompose the gate: verify chain alone over the profiled hits
      val allP = members.join(sigs, "set_key")
        .select(col("doc_id"), col("sh"), col("sig"), col("bb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val benchP = allP.filter(col("doc_id") % 10 === 0)
      val corpP = allP.filter(col("doc_id") % 10 =!= 0)
      val (_, tVerdict) = timed {
        DataPipelineQueries.fuzzyScreenVerdict(benchP, corpP, hits,
          "ssp_profile_cap").count()
      }
      allP.unpersist()
      println(
        s"""{"dir":"$dir","t_memo":${fmt(tMemo)},"t_bench_probe":${fmt(tProbe)},"t_gate_full":${fmt(tGate)},"t_verdict_alone":${fmt(tVerdict)},""" +
        s""""t_stream":${fmt(tStream)},"t_hit_count":${fmt(tCount)},""" +
        s""""n_hits":$nHits,"t_batch_same_chain":${fmt(tBatch)},""" +
        s""""n_batch":$nBatch,"t_stream_noop":${fmt(tNoop)}}""")
      }
    }
    spark.stop()
  }
}
