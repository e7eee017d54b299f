package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  // Shared with Bench (one copy: an escaping fix must reach both JSON
  // emitters or it corrupts exactly the error-bearing runs).
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** One `name=col:type,...` fingerprint line per fixture table, printed
    * before any query runs. Round 7's fixtures changed encoding BETWEEN the
    * builder's close and the gate run and 7 queries failed as silently
    * missing rows; this line turns the next schema drift into a first-glance
    * diagnosis instead of a forensic exercise. Shared with [[Bench]]. */
  private[graft] def schemaFingerprints(spark: SparkSession, sfDir: String): Seq[(String, String)] = {
    // a TIMESTAMP(NANOS) column fails Spark 4's schema conversion outright
    // without the legacy flag; with it the fingerprint honestly reads
    // `ts:bigint` — still a faithful record of the physical encoding
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").flatMap { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists())
        try {
          // raw footer schema, NOT through Tables.events: the point is to
          // record what's physically on disk before any normalization
          val fp = spark.read.parquet(p).schema.fields
            .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
          Some(t -> fp)
        } catch { case e: Throwable => Some(t -> s"UNREADABLE:${e.getClass.getSimpleName}") }
      else None
    }
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev only; the driver passes 2): comma-separated
    // query names to dump, for spot-checking one oracle without the full run
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
    }
    // a typo'd name would otherwise filter everything out and exit 0 —
    // an empty "verification" that reads as a pass
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // fixture-schema preflight: one stderr line + a persisted artifact, so
    // both the live log and the dump record what the queries actually read
    val schemas = schemaFingerprints(spark, sfDir)
    schemas.foreach { case (t, fp) => System.err.println(s"[verify] schema $t=$fp") }
    Files.writeString(Paths.get(s"$outDir/_schemas.json"),
      schemas.map { case (t, fp) => s"${q(t)}: ${q(fp)}" }.mkString("{", ",", "}"))
    // every caught failure lands here and in _failures.json — round 7's
    // breakage surfaced as 7 silently MISSING rows in the driver's report
    // ("query doesn't exist" instead of "query broke"); the manifest makes
    // a broken query a visible artifact. Written even when empty, so "no
    // failures" is distinguishable from "manifest not produced".
    val failures = scala.collection.mutable.ArrayBuffer[(String, Throwable)]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      System.err.println(s"[verify] running $name")
      try {
        val df = fn(spark, sfDir)
        // driver-compat hash-surface gate (SURVEY §2.10): pandas cannot sort
        // a list column, so a complex-typed output column is certain to err
        // at the driver even though the values are right — fail it HERE,
        // where the builder sees it, instead of in CORRECTNESS_r{N}
        val complex = OracleLint.complexCols(df.schema)
        if (complex.nonEmpty)
          throw new IllegalStateException(
            s"driver-unportable output schema (string-join list data, §2.10): ${complex.mkString(", ")}")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> e
      }
    }
    val failJson = failures.map { case (name, e) =>
      s"""{"name":${q(name)},"exception":${q(e.getClass.getName)},"message":${q(String.valueOf(e.getMessage))}}"""
    }.mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} FAILED: " +
        failures.map(_._1).mkString(", "))
    // oracle-side HUGEINT lint (heuristic, stderr-only: DuckDB is not on
    // this classpath so type inference is textual; DriverCompatLintSpec
    // holds the same check as a hard test over the full oracle surface)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      OracleLint.hugeintRisks(sql).foreach(r =>
        System.err.println(s"[verify] ORACLE LINT $name: $r"))
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
