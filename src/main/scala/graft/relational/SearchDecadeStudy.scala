package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only decade harness for the r14 search additions (r14 verdict ask
  * #7): similarity_range_ann / similarity_filtered_ann /
  * dedup_embedding_decontaminate carried gate-SF recall only; this
  * measures, per fixture decade, MEASURED recall fractions (not just the
  * floor booleans), candidate/result volumes, and wall time, so PLANS
  * can record how the pruned legs hold up as the corpus grows 10×/100×
  * under the adaptive knobs.
  *
  * Usage: `runMain graft.relational.SearchDecadeStudy <sfDir> [...]` —
  * one JSON line per dir. Never invoked by the driver. */
object SearchDecadeStudy {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SearchDecadeStudy <sfDir> [<sfDir2> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NOTE: spark.driver.memory set here would be a no-op — the JVM heap
      // is fixed at launch (build.sbt's fork flags; raise with
      // SPARK_DRIVER_MEM=24g per the verify skill for 100x fixtures)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Similarity
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    args.foreach { dir =>
      val e = Tables.embeddings(spark, dir)
      val q = e.filter(col("vec_id") < 10)

      // --- similarity_range_ann: pruned radius search vs exact ---
      // probe-budget knobs (env-overridable so the decade table can show
      // the recall-vs-budget response: recall at a fixed budget decays as
      // the replicated fixtures grow the in-radius population, and the
      // budget knob — more tables / bigger bucket cap — buys it back)
      val rTables = sys.env.getOrElse("GRAFT_RANGE_TABLES", "8").toInt
      val rCap = sys.env.getOrElse("GRAFT_RANGE_BUCKET_CAP", "256").toInt
      val (rangeRow, tRange) = timed {
        val ann = Similarity.annRange(e, q, DataPipelineQueries.RangeTau,
            tables = rTables, maxBucketSize = rCap)
          .select(col("qid"), col("neighbor")).localCheckpoint(true)
        val exact = Similarity.bruteForceRange(e, q, DataPipelineQueries.RangeTau)
          .select(col("qid"), col("neighbor")).localCheckpoint(true)
        val nFound = exact.join(ann, Seq("qid", "neighbor")).count()
        val nExact = exact.count()
        val nAnn = ann.count()
        (nFound, nExact, nAnn)
      }

      // --- similarity_range_ann_adaptive: density-sized budget vs exact ---
      // the r15 ask-#4 decade evidence: the same radius query with
      // tables/bits/cap derived from the rangeDensity pre-pass; records
      // the derived knobs and the pre-pass estimate alongside recall/wall
      // so the response is attributable
      val ((adapRow, adapKnobs), tAdap) = timed {
        val (n, nHat) = Similarity.rangeDensity(e, q, DataPipelineQueries.RangeTau)
        val (kTables, kBits, kCap) =
          Similarity.adaptiveRangeKnobs(n, nHat, DataPipelineQueries.RangeTau)
        val ann = Similarity.annRange(e, q, DataPipelineQueries.RangeTau,
            tables = kTables, bits = kBits, maxBucketSize = kCap)
          .select(col("qid"), col("neighbor")).localCheckpoint(true)
        val exact = Similarity.bruteForceRange(e, q, DataPipelineQueries.RangeTau)
          .select(col("qid"), col("neighbor")).localCheckpoint(true)
        val nFound = exact.join(ann, Seq("qid", "neighbor")).count()
        ((nFound, exact.count(), ann.count()), (kTables, kBits, kCap, nHat))
      }

      // --- similarity_filtered_ann: label-filtered top-5 vs exact ---
      val (filtRow, tFilt) = timed {
        val ann = Similarity.annTopKFiltered(e, q, k = 5, filterCol = "label")
          .filter(col("neighbor").isNotNull)
          .select(col("qid"), col("neighbor")).localCheckpoint(true)
        val qv = q.select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").cast("array<double>").as("qe"))
        val c = e.select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
        val exact = c.join(broadcast(qv), col("label") === col("qlabel"))
          .filter(col("qid") =!= col("vec_id"))
          .withColumn("cosine", round(Similarity.cosine("qe", "emb"), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("vec_id").as("neighbor"))
        val nFound = exact.join(ann, Seq("qid", "neighbor")).count()
        val nExact = exact.count()
        val nAnnRet = ann.count()
        (nFound, nExact, nAnnRet)
      }

      // --- embedding decontamination: exact screen, wall + volume ---
      // The gate fixture's benchmark slice (vec_id % 10 = 0) grows WITH
      // the corpus, making the |corpus|·|bench| screen quadratic across
      // fixture decades — a fixture artifact. Production benchmark
      // suites are FIXED-SIZE (the query scaladoc's whole scale
      // argument), so the decade measurement holds the bench side at the
      // base fixture's 200 vectors (original-id slice; the replicated
      // fixtures offset copy ids upward) and lets only the corpus grow —
      // the corpus-linear growth the plan actually promises.
      val (embRow, tEmb) = timed {
        val bench = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 2000)
          .select(col("vec_id").as("bid"),
            col("embedding").cast("array<double>").as("be"))
        val corp = e.filter(col("vec_id") % 10 =!= 0)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val rep = corp.crossJoin(broadcast(bench))
          .withColumn("cosine", round(Similarity.cosine("be", "emb"), 6))
          .groupBy(col("vec_id"))
          .agg(max(struct(col("cosine"), (-col("bid")).as("nbid"))).as("best"))
          .select(col("vec_id"), col("best.cosine").as("cosine"))
          .localCheckpoint(true)
        (rep.count(), rep.filter(col("cosine") >= 0.45).count())
      }

      println(
        s"""{"dir":"$dir",""" +
        s""""range_ann":{"t":${fmt(tRange)},"n_found":${rangeRow._1},""" +
        s""""n_exact":${rangeRow._2},"n_ann":${rangeRow._3},""" +
        s""""recall":${fmt(rangeRow._1.toDouble / math.max(1L, rangeRow._2))}},""" +
        s""""range_ann_adaptive":{"t":${fmt(tAdap)},"n_found":${adapRow._1},""" +
        s""""n_exact":${adapRow._2},"n_ann":${adapRow._3},""" +
        s""""recall":${fmt(adapRow._1.toDouble / math.max(1L, adapRow._2))},""" +
        s""""tables":${adapKnobs._1},"bits":${adapKnobs._2},""" +
        s""""cap":${adapKnobs._3},"n_hat":${fmt(adapKnobs._4)}},""" +
        s""""filtered_ann":{"t":${fmt(tFilt)},"n_found":${filtRow._1},""" +
        s""""n_exact":${filtRow._2},"n_returned":${filtRow._3},""" +
        s""""recall":${fmt(filtRow._1.toDouble / math.max(1L, filtRow._2))}},""" +
        s""""embed_decontam":{"t":${fmt(tEmb)},"n_rows":${embRow._1},""" +
        s""""n_contaminated":${embRow._2}}}""")
    }
    spark.stop()
  }
}
