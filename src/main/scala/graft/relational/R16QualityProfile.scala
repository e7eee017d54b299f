package graft.relational

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r16 optimization round): phase timings for the
  * quality_model family build + the quality_classifier serve path, so the
  * optimization targets the measured phase instead of the whole query.
  * Pattern follows MinhashProfile/SearchDecadeStudy (dev-side mains, never
  * in the gate). Heap comes from the forked JVM flags (SPARK_DRIVER_MEM).
  *
  * Usage: runMain graft.relational.R16QualityProfile <sfDir> [cpus]
  */
object R16QualityProfile {
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
      println(f"[qprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val tmp = java.nio.file.Files.createTempDirectory("graft_qprof_")
    try {
      // warm-up: absorb JVM/codegen/scan init so phase 1 isn't inflated
      t("warmup (docs scan x2)") {
        Tables.tbl(s, sfDir, "documents").selectExpr("sum(length(text))").head()
        Tables.tbl(s, sfDir, "documents").selectExpr("sum(length(text))").head()
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val docsT = Tables.tbl(s, sfDir, "documents")
      val tok = docsT.select(col("doc_id"),
        explode(graft.text.TextOps.tokens("text")).as("token"))
      t("sub: tokenize+count")(noop(tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))))
      t("sub: +md5 per occurrence")(noop(tok.withColumn("hx", md5(col("token")))
        .groupBy(col("doc_id")).agg(count(lit(1)), max(col("hx")))))
      val hv = (pos: Int) =>
        s"IF(ascii(substr(hx, $pos, 1)) >= 97, ascii(substr(hx, $pos, 1)) - 87," +
          s" ascii(substr(hx, $pos, 1)) - 48)"
      t("sub: +fi arith + 2-level agg")(noop(tok
        .withColumn("hx", md5(col("token")))
        .withColumn("fi", expr(s"(${hv(1)} * 16 + ${hv(2)}) % 64").cast("int"))
        .groupBy(col("doc_id"), col("fi")).agg(count(lit(1)).cast("double").as("cnt"))
        .groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("fi"), col("cnt")))).as("m"),
          sum(col("cnt")).as("tot"))
        .select(col("doc_id"), expr(
          "transform(sequence(0, 63), i -> coalesce(element_at(m, i), cast(0.0 as double)) / tot)")
          .as("farr"))))
      // phase 1: the feature table (tokenize + md5 hash + tf-norm)
      t("feats write")(DataPipelineQueries.qualityFeaturesDev(s, sfDir)
        .write.mode("overwrite").parquet(s"$tmp/feats"))
      val feats = s.read.parquet(s"$tmp/feats")
      // phase 2: the LM table (memoized family build)
      val lm = t("lm_scores build")(DataPipelineQueries.lmScoresDev(s, sfDir)
        .localCheckpoint(true))
      val nLm = lm.count()
      // phase 3: strata
      val keyed = lm.withColumn("k", floor(col("lm_logp") * 100).cast("long"))
      val off = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .withColumn("offset", coalesce(
          sum(col("c")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("k").desc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      val strata = keyed
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("lm_logp").desc, col("doc_id"))))
        .join(broadcast(off.select(col("k"), col("offset"))), Seq("k"))
        .withColumn("bucket", expr(s"(((offset + rn) - 1) * 3) div $nLm"))
        .filter(col("bucket") =!= 1)
        .select(col("doc_id"), when(col("bucket") === 0, 1.0).otherwise(0.0).as("label"))
      t("labels write")(strata.write.mode("overwrite").parquet(s"$tmp/labels"))
      val labeled = s.read.parquet(s"$tmp/labels").join(feats, "doc_id")
      val trainBase = labeled.filter(col("doc_id") % 2 === 0)
        .withColumn("features", array_to_vector(col("farr")))
      // phase 4a: LR fit at session partitioning
      val train32 = trainBase
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[qprof] train rows = ${train32.count()}, partitions = " +
        train32.rdd.getNumPartitions)
      val m32 = t("LR fit (as-is)")(new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setStandardization(true).fit(train32))
      println(s"[qprof] iters(as-is) = ${m32.summary.totalIterations}")
      train32.unpersist()
      // phase 4b: LR fit on a coalesced cache
      val train8 = trainBase.coalesce(8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      train8.count()
      val m8 = t("LR fit (coalesce 8)")(new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setStandardization(true).fit(train8))
      println(s"[qprof] iters(c8) = ${m8.summary.totalIterations}")
      println(s"[qprof] coef delta max = ${
        m32.coefficients.toArray.zip(m8.coefficients.toArray)
          .map { case (a, b) => math.abs(a - b) }.max}")
      train8.unpersist()
    } finally {
      graft.relational.DataPipelineQueries.deleteRecursively(tmp)
      s.stop()
    }
  }
}
