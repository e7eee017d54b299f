package graft.sources

import graft.TestSpark
import graft.core.Pfsa
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** The pfsa DataSource V2 connector: value round-trip against the codec
  * on random machines, real column pruning at the scan, one input
  * partition per model file, and short-name registration through the
  * DataSourceRegister service loader. */
class PfsaSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(dir: java.nio.file.Path, name: String, p: Pfsa): Unit =
    java.nio.file.Files.write(dir.resolve(s"$name.pfsa"),
      p.toText.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def randomMachine(seed: Long, states: Int, alpha: Int): Pfsa = {
    val rnd = new scala.util.Random(seed)
    // rows of exact 3-dp probabilities summing to 1 (text codec carries
    // shortest-round-trip doubles, so exact decimals round-trip bit-equal)
    def row(): Array[Double] = {
      val cuts = Array.fill(alpha - 1)(rnd.nextInt(1000)).sorted
      val parts = (cuts :+ 1000).zip(0 +: cuts.toSeq).map { case (b, a) => (b - a) / 1000.0 }
      parts.toArray
    }
    Pfsa(
      conn = Array.fill(states)(Array.fill(alpha)(rnd.nextInt(states))),
      pitilde = Array.fill(states)(row()),
      symFrq = row(),
      annErr = 0.0, mrgEps = 0.0, synStr = None)
  }

  test("connector rows equal the codec's parse for random machines") {
    val dir = java.nio.file.Files.createTempDirectory("pfsasrc")
    val machines = Map(
      "a" -> randomMachine(1L, 4, 3),
      "b" -> randomMachine(2L, 2, 5),
      "c" -> Pfsa.m2)
    machines.foreach { case (n, p) => write(dir, n, p) }
    val got = spark.read.format("pfsa").load(dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getDouble(3), r.getInt(4), r.getDouble(5))).toMap
    val want = (for {
      (n, p) <- machines.toSeq
      q <- p.conn.indices
      sym <- 0 until p.alphabetSize
    } yield (n, q, sym) -> (p.pitilde(q)(sym), p.conn(q)(sym), p.symFrq(sym))).toMap
    assert(got === want)
  }

  test("column pruning reaches the scan and one partition per file") {
    val dir = java.nio.file.Files.createTempDirectory("pfsaprune")
    write(dir, "m2", Pfsa.m2); write(dir, "m2u", Pfsa.m2u)
    val df = spark.read.format("pfsa").load(dir.toString).select("pitilde")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a DSv2 BatchScanExec")
    assert(scans.head.output.map(_.name) == Seq("pitilde"),
      s"pruned schema must reach the scan: ${scans.head.output}")
    assert(df.rdd.getNumPartitions == 2, "one input partition per model file")
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq
      == Seq(0.3, 0.4, 0.4, 0.4, 0.6, 0.6, 0.6, 0.7))
  }

  test("write path reassembles scrambled multi-partition rows per machine") {
    import spark.implicits._
    val machines = Map("x" -> randomMachine(7L, 5, 4), "y" -> randomMachine(8L, 3, 2),
      "z" -> randomMachine(9L, 2, 6))
    val rows = for {
      (n, p) <- machines.toSeq
      q <- p.conn.indices; sym <- 0 until p.alphabetSize
    } yield (n, q, sym, p.pitilde(q)(sym), p.conn(q)(sym), p.symFrq(sym))
    val dir = java.nio.file.Files.createTempDirectory("pfsawrite").toString
    // reversed + repartitioned: only the connector's required
    // distribution/ordering can put each machine whole and sorted in one
    // writer — a split machine fails the complete-matrix validation, so
    // success here PROVES Spark planned the clustering shuffle
    rows.reverse.toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
      .repartition(5)
      .write.format("pfsa").mode("overwrite").save(dir)
    val back = spark.read.format("pfsa").load(dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getDouble(3), r.getInt(4), r.getDouble(5))).toMap
    assert(back === rows.map(t => (t._1, t._2, t._3) -> (t._4, t._5, t._6)).toMap)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".staged")),
      "no staged files may survive the commit")
  }

  test("overwrite truncates stale machine files; append keeps them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pfsatrunc")
    write(dir, "stale", Pfsa.m2u)
    def df(n: String) = (for {
      q <- Pfsa.m2.conn.indices; sym <- 0 until Pfsa.m2.alphabetSize
    } yield (n, q, sym, Pfsa.m2.pitilde(q)(sym), Pfsa.m2.conn(q)(sym), Pfsa.m2.symFrq(sym)))
      .toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
    df("fresh").write.format("pfsa").mode("overwrite").save(dir.toString)
    val names1 = spark.read.format("pfsa").load(dir.toString)
      .select("machine").distinct().collect().map(_.getString(0)).toSet
    assert(names1 === Set("fresh"), s"overwrite must remove stale files: $names1")
    df("extra").write.format("pfsa").mode("append").save(dir.toString)
    val names2 = spark.read.format("pfsa").load(dir.toString)
      .select("machine").distinct().collect().map(_.getString(0)).toSet
    assert(names2 === Set("fresh", "extra"))
  }

  test("write rejects a non-canonical schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pfsabad").toString
    val bad = Seq(("m", 0, 0)).toDF("machine", "state", "symbol")
    val e = intercept[Exception] {
      bad.write.format("pfsa").mode("overwrite").save(dir)
    }
    // Spark's analyzer rejects against Table.schema() before the builder
    // runs (INCOMPATIBLE_DATA_FOR_TABLE); the builder's own "canonical
    // schema" require is the backstop for non-DataFrameWriter entry points
    assert(e.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE") ||
      e.getMessage.contains("canonical schema"), e.toString)
  }

  test("write rejects per-state inconsistent sym_frq instead of dropping it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pfsafrq").toString
    // state-1 rows disagree with state-0 on symbol 0's frequency: keeping
    // state 0's copy silently would be a lossy write
    val rows = Seq(
      ("m", 0, 0, 0.6, 0, 0.5), ("m", 0, 1, 0.4, 1, 0.5),
      ("m", 1, 0, 0.3, 0, 0.9), ("m", 1, 1, 0.7, 1, 0.5))
    val e = intercept[Exception] {
      rows.toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
        .write.format("pfsa").mode("overwrite").save(dir)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("sym_frq")), e.toString)
  }

  test("machine filters push down and prune input partitions at listing time") {
    val dir = java.nio.file.Files.createTempDirectory("pfsapush")
    write(dir, "m1", Pfsa.m2); write(dir, "m2", Pfsa.m2u)
    write(dir, "m3", randomMachine(3L, 3, 3)); write(dir, "probe_a", Pfsa.m2)
    val base = spark.read.format("pfsa").load(dir.toString)

    // equality: exactly one partition planned, not one per file
    val eq = base.where(org.apache.spark.sql.functions.col("machine") === "m2")
    assert(eq.rdd.getNumPartitions == 1,
      s"equality on machine must prune to 1 file, got ${eq.rdd.getNumPartitions}")
    assert(eq.select("machine").distinct().collect().map(_.getString(0)).toSeq == Seq("m2"))
    val scan = eq.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(scan.scan.asInstanceOf[PfsaScan].description().contains("machine"),
      "pushed filter must be visible in the scan description")
    // fully handled: no residual Filter node survives above the scan
    assert(!eq.queryExecution.executedPlan.toString.contains("Filter ("),
      s"machine equality must leave no residual filter:\n${eq.queryExecution.executedPlan}")

    // IN and prefix prune to their member counts
    val in = base.where(org.apache.spark.sql.functions.col("machine").isin("m1", "m3", "nope"))
    assert(in.rdd.getNumPartitions == 2)
    val pre = base.where(org.apache.spark.sql.functions.col("machine").startsWith("probe_"))
    assert(pre.rdd.getNumPartitions == 1)
    assert(pre.select("machine").distinct().collect().map(_.getString(0)).toSeq
      == Seq("probe_a"))

    // a non-machine predicate is NOT claimed: it stays a residual filter
    // and partition count is unpruned
    val res = base.where(org.apache.spark.sql.functions.col("state") === 0)
    assert(res.rdd.getNumPartitions == 4, "state filter must not prune files")
    assert(res.collect().forall(_.getInt(1) == 0))
  }

  test("connector writes maintain an authoritative _manifest; scans plan from it") {
    import spark.implicits._
    def df(n: String) = (for {
      q <- Pfsa.m2.conn.indices; sym <- 0 until Pfsa.m2.alphabetSize
    } yield (n, q, sym, Pfsa.m2.pitilde(q)(sym), Pfsa.m2.conn(q)(sym), Pfsa.m2.symFrq(sym)))
      .toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
    val dir = java.nio.file.Files.createTempDirectory("pfsamani")
    df("alpha").write.format("pfsa").mode("overwrite").save(dir.toString)
    df("beta").write.format("pfsa").mode("append").save(dir.toString)
    val manifest = dir.resolve("_manifest")
    assert(java.nio.file.Files.exists(manifest))
    assert(new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8")
      .split("\n").toSeq == Seq("alpha", "beta"),
      "append must merge the prior manifest")
    // a hand-dropped stray machine is invisible while the manifest stands
    write(dir, "stray", Pfsa.m2u)
    val seen = spark.read.format("pfsa").load(dir.toString)
      .select("machine").distinct().collect().map(_.getString(0)).toSet
    assert(seen == Set("alpha", "beta"),
      s"manifest must be authoritative over the listing: $seen")
    // pushed machine filter prunes manifest LINES: one partition planned
    val one = spark.read.format("pfsa").load(dir.toString)
      .where(org.apache.spark.sql.functions.col("machine") === "beta")
    assert(one.rdd.getNumPartitions == 1)
    // deleting the manifest falls back to the directory listing
    java.nio.file.Files.delete(manifest)
    val all = spark.read.format("pfsa").load(dir.toString)
      .select("machine").distinct().collect().map(_.getString(0)).toSet
    assert(all == Set("alpha", "beta", "stray"))
  }

  test("reconcile republishes the manifest from disk: strays appear, ghosts drop") {
    import spark.implicits._
    def df(n: String) = (for {
      q <- Pfsa.m2.conn.indices; sym <- 0 until Pfsa.m2.alphabetSize
    } yield (n, q, sym, Pfsa.m2.pitilde(q)(sym), Pfsa.m2.conn(q)(sym), Pfsa.m2.symFrq(sym)))
      .toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
    val dir = java.nio.file.Files.createTempDirectory("pfsarecon")
    df("alpha").write.format("pfsa").mode("overwrite").save(dir.toString)
    df("beta").write.format("pfsa").mode("append").save(dir.toString)
    // out-of-band surgery the manifest cannot see: a hand-dropped stray
    // and a hand-deleted committed model
    write(dir, "stray", Pfsa.m2u)
    java.nio.file.Files.delete(dir.resolve("beta.pfsa"))
    def names() = spark.read.format("pfsa").load(dir.toString)
      .select("machine").distinct().collect().map(_.getString(0)).toSet
    // before: manifest-first planning is blind to both edits (the stray is
    // invisible; the ghost would plan a partition for a missing file)
    assert(new String(java.nio.file.Files.readAllBytes(dir.resolve("_manifest")), "UTF-8")
      .split("\n").toSeq == Seq("alpha", "beta"))
    val reconciled = PfsaSource.reconcile(dir.toString)
    assert(reconciled == Seq("alpha", "stray"), s"reconcile returned $reconciled")
    assert(new String(java.nio.file.Files.readAllBytes(dir.resolve("_manifest")), "UTF-8")
      .split("\n").toSeq == Seq("alpha", "stray"))
    // after: the scan (still manifest-first — the read path is untouched)
    // sees exactly the disk's membership, and values are the codec's
    assert(names() == Set("alpha", "stray"))
    val strayRows = spark.read.format("pfsa").load(dir.toString)
      .where(org.apache.spark.sql.functions.col("machine") === "stray")
    assert(strayRows.rdd.getNumPartitions == 1, "manifest-line pruning must still plan 1 file")
    assert(strayRows.collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      === (for { q <- 0 to 1; s <- 0 to 1 } yield (q, s) -> Pfsa.m2u.pitilde(q)(s)).toMap)
  }

  test("append's manifest refresh self-heals an out-of-band deletion") {
    import spark.implicits._
    def df(n: String) = (for {
      q <- Pfsa.m2.conn.indices; sym <- 0 until Pfsa.m2.alphabetSize
    } yield (n, q, sym, Pfsa.m2.pitilde(q)(sym), Pfsa.m2.conn(q)(sym), Pfsa.m2.symFrq(sym)))
      .toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
    val dir = java.nio.file.Files.createTempDirectory("pfsaheal")
    df("alpha").write.format("pfsa").mode("overwrite").save(dir.toString)
    df("beta").write.format("pfsa").mode("append").save(dir.toString)
    java.nio.file.Files.delete(dir.resolve("beta.pfsa"))
    // the next write rebuilds prior names from the LISTING, so the stale
    // name drops instead of being carried forward forever
    df("gamma").write.format("pfsa").mode("append").save(dir.toString)
    assert(new String(java.nio.file.Files.readAllBytes(dir.resolve("_manifest")), "UTF-8")
      .split("\n").toSeq == Seq("alpha", "gamma"),
      "stale deleted name must not survive the next append's refresh")
  }

  test("write rejects machine names the manifest cannot round-trip") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    Seq("a ", " a", "a\nb", "a/b").foreach { bad =>
      val dir = java.nio.file.Files.createTempDirectory("pfsabadname").toString
      val rows = for {
        q <- Pfsa.m2.conn.indices; sym <- 0 until Pfsa.m2.alphabetSize
      } yield (bad, q, sym, Pfsa.m2.pitilde(q)(sym), Pfsa.m2.conn(q)(sym), Pfsa.m2.symFrq(sym))
      val e = intercept[Exception] {
        rows.toDF("machine", "state", "symbol", "pitilde", "next_state", "sym_frq")
          .write.format("pfsa").mode("overwrite").save(dir)
      }
      assert(messages(e).exists(_.contains("round-trip")), s"'$bad': $e")
    }
  }

  test("non-pfsa files are ignored; empty dir yields an empty table") {
    val dir = java.nio.file.Files.createTempDirectory("pfsamixed")
    write(dir, "only", Pfsa.m2)
    java.nio.file.Files.write(dir.resolve("readme.txt"), "not a machine".getBytes)
    assert(spark.read.format("pfsa").load(dir.toString).count() == 4L)
    val empty = java.nio.file.Files.createTempDirectory("pfsaempty")
    assert(spark.read.format("pfsa").load(empty.toString).count() == 0L)
  }
}
