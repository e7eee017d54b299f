package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's PFSA text-file model format
  * (the `%ANN_ERR`/`%PITILDE`/`#CONNX` codec of detection.py:502-547 /
  * examples/M2.cfg:3-10, already emitted by `sink_pfsa_file` through
  * [[graft.core.Pfsa.toText]]): `spark.read.format("pfsa").load(dir)`
  * exposes every `*.pfsa` machine at the TOP LEVEL of `dir` (flat
  * library layout — the shape the write side emits; subdirectories are
  * deliberately not recursed) as a TABLE of transition
  * rows `(machine, state, symbol, pitilde, next_state, sym_frq)` — the
  * relational view a fleet of fitted machines needs for SQL-side
  * inspection (per-state entropy, transition audits, cross-model joins)
  * without a driver-side parse loop.
  *
  * This is the last rung of the custom-operator ladder the engine had
  * not yet exercised: native codegen Expressions, TypedImperativeAggregates,
  * a custom LogicalPlan + optimizer rule, and now a CONNECTOR — the
  * `TableProvider → Table → ScanBuilder → Batch → PartitionReader` chain,
  * registered under the `pfsa` short name via the DataSourceRegister
  * service file. Column pruning is honored for real
  * ([[SupportsPushDownRequiredColumns]]): a `select(machine)` reaches the
  * reader as a 1-field schema and the emitted InternalRows carry exactly
  * the pruned columns — spec-asserted on the scan's output.
  *
  * Scale shape: one [[InputPartition]] PER FILE (a model library is a
  * fleet of small machines — thousands of files spread across executors,
  * each parsed where it lands); file IO goes through the Hadoop
  * FileSystem API, so `dir` can be any defaultFS-reachable URI, not just
  * local disk. Model files are KBs — the per-file granularity is the
  * natural parallelism unit, never a bottleneck. */
class PfsaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pfsa"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PfsaSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PfsaTable(properties.get("path"))
}

object PfsaSource {
  /** Library manifest maintained by the write side: one machine name per
    * line. When present, scans plan from it instead of listing the
    * directory — the million-model path (see PfsaScan). */
  val ManifestName = "_manifest"

  /** Machine names must survive the line-based manifest VERBATIM: reject
    * names the format cannot round-trip (line breaks, edge whitespace —
    * which a defensive reader could neither keep nor safely trim) and
    * path separators at WRITE time, where the producer sees the failure.
    * Listing-based reads handled such names by accident; the manifest
    * makes the contract explicit. */
  def validMachineName(n: String): Boolean =
    n.nonEmpty && n == n.trim && !n.exists(c => c == '\n' || c == '\r' || c == '/')

  /** The manifest's machine names, or None when no manifest exists —
    * ONE parse shared by the scan and the commit refresh so the read and
    * write sides can never disagree about library membership. Lines
    * arrive verbatim (names are validated at write, so no trimming). */
  def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                   dir: org.apache.hadoop.fs.Path): Option[Seq[String]] = {
    val m = new org.apache.hadoop.fs.Path(dir, ManifestName)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.split("\n").toSeq.filter(_.nonEmpty))
    }
  }

  /** Stage-and-rename manifest publish — the single write path shared by
    * the connector's commit refresh and [[reconcile]], so a reader can
    * never observe a torn manifest. */
  def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                    dir: org.apache.hadoop.fs.Path, names: Seq[String]): Unit = {
    val manifestPath = new org.apache.hadoop.fs.Path(dir, ManifestName)
    val staged = new org.apache.hadoop.fs.Path(dir, s".$ManifestName.staged")
    val out = fs.create(staged, true)
    try out.write(names.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(manifestPath)) fs.delete(manifestPath, false)
    require(fs.rename(staged, manifestPath),
      s"pfsa manifest publish failed: $manifestPath")
  }

  /** One-call library repair for the manifest-first read path's documented
    * blind spot: the manifest is authoritative, so a `.pfsa` file dropped
    * into (or deleted from) the directory by hand is invisible (or a
    * planned-but-missing partition) until the next connector write.
    * `reconcile(dir)` re-lists the directory and republishes the manifest
    * as the disk's ACTUAL membership — strays become visible, ghosts
    * drop out — without touching any model file or the read path itself.
    * Returns the reconciled names. One listing + one KB-scale manifest
    * write; safe to run any time no concurrent write is committing. */
  def reconcile(dir: String,
                conf: Map[String, String] = sessionConfMap()): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir, conf)
    // a typo'd path must FAIL, not fabricate a fresh directory holding an
    // authoritative empty manifest while the real library stays broken
    require(fs.exists(p), s"pfsa reconcile: no such library directory: $dir")
    val names = fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".pfsa"))
      .map(_.getPath.getName.stripSuffix(".pfsa")).toSeq.sorted
    writeManifest(fs, p, names)
    names
  }

  /** One row per (state, symbol) transition of each machine. */
  val Schema: StructType = StructType(Seq(
    StructField("machine", StringType, nullable = false),
    StructField("state", IntegerType, nullable = false),
    StructField("symbol", IntegerType, nullable = false),
    StructField("pitilde", DoubleType, nullable = false),
    StructField("next_state", IntegerType, nullable = false),
    StructField("sym_frq", DoubleType, nullable = false)))

  /** The SESSION's Hadoop configuration as a serializable map — a bare
    * `new Configuration()` would drop every `spark.hadoop.*` session
    * setting (S3 credentials, defaultFS), silently breaking non-local
    * URIs. Captured on the driver at plan/write time, rebuilt wherever
    * the FS is touched (Spark's own SerializableConfiguration is
    * `private[spark]`; the map is the dependency-free equivalent).
    * INVARIANT: driver-side only — `SparkSession.active` is unusable on
    * executors; every call site is plan-time (PfsaScan ctor) or
    * write-build time (PfsaBatchWrite ctor), and the RESULT map is what
    * ships to executors. Keep it that way. */
  def sessionConfMap(): Map[String, String] = {
    val c = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  def confOf(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  def fsOf(path: String, m: Map[String, String]): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path).getFileSystem(confOf(m))
}

class PfsaTable(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "pfsa source needs a load(path)/save(path)")
  override def name(): String = s"pfsa:$path"
  override def schema(): StructType = PfsaSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PfsaScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PfsaWriteBuilder(path, info.schema())
}

/** `machine` IS the file name stem, so predicates on it prune at
  * FILE-LISTING time — the connector's analog of parquet partition
  * pruning: `.where($"machine" === "m2")` plans exactly one
  * InputPartition instead of opening every model in the library.
  * Equality / IN / prefix / IsNotNull on `machine` are handled FULLY
  * (machine is non-nullable and bijective with the file name, so no
  * residual evaluation is needed); every other filter stays with Spark. */
class PfsaScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, StringStartsWith}
  private var required: StructType = PfsaSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("machine", _: String) => true
      case In("machine", vs) => vs.forall(_.isInstanceOf[String])
      case StringStartsWith("machine", _) => true
      case IsNotNull("machine") => true // non-nullable: vacuously true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new PfsaScan(path, required, pushed)
}

class PfsaScan(path: String, required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull, StringStartsWith}
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PfsaScan path=$path, PushedFilters: [${filters.mkString(", ")}]"

  // captured once on the driver; ships inside the factory to executors
  private val conf = PfsaSource.sessionConfMap()

  private def keep(stem: String): Boolean = filters.forall {
    case EqualTo("machine", v: String) => stem == v
    case In("machine", vs) => vs.exists(_ == stem)
    case StringStartsWith("machine", p) => stem.startsWith(p)
    case IsNotNull("machine") => true
    case _ => true // pushFilters never accepts anything else
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = PfsaSource.fsOf(path, conf)
    val dir = new org.apache.hadoop.fs.Path(path)
    // MANIFEST-FIRST planning (the million-model caveat): the write side
    // maintains a `_manifest` of machine names, so a library of any size
    // plans from ONE small file read instead of a directory listing —
    // and the pushed machine filters prune manifest LINES before any
    // path is even constructed. When present the manifest is
    // authoritative (a hand-dropped stray .pfsa is invisible until the
    // next connector write refreshes it — documented trade; delete the
    // manifest to fall back to listing). Absent → one listStatus over
    // the top level (flat library BY CONTRACT: the write side emits a
    // flat dir; subdirectories are out of scope, not skipped).
    val stems: Iterator[String] = PfsaSource.readManifest(fs, dir) match {
      case Some(names) => names.iterator
      case None =>
        fs.listStatus(dir).iterator
          .filter(st => st.isFile && st.getPath.getName.endsWith(".pfsa"))
          .map(_.getPath.getName.stripSuffix(".pfsa"))
    }
    stems.filter(keep)
      .map(n => PfsaInputPartition(new org.apache.hadoop.fs.Path(dir, s"$n.pfsa").toString)
        : InputPartition)
      .toArray
      .sortBy(_.asInstanceOf[PfsaInputPartition].file) // deterministic plan
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PfsaReaderFactory(required.fieldNames, conf)
}

case class PfsaInputPartition(file: String) extends InputPartition

class PfsaReaderFactory(fields: Array[String], conf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PfsaPartitionReader(partition.asInstanceOf[PfsaInputPartition].file, fields, conf)
}

/** Parses one machine file on the executor it was assigned to and emits
  * its transition rows, already projected to the pruned schema. */
class PfsaPartitionReader(file: String, fields: Array[String], conf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = PfsaSource.fsOf(file, conf)
    val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt) // model files are KBs
    val in = fs.open(hp)
    try in.readFully(0, buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    val p = graft.core.Pfsa.fromText(text)
    val stem = hp.getName.stripSuffix(".pfsa")
    val machine = UTF8String.fromString(stem)
    // one extractor per projected column, resolved ONCE at reader
    // construction (an unknown field also fails here, not mid-emission)
    val extract: Array[(Int, Int) => Any] = fields.map {
      case "machine"    => (_: Int, _: Int) => machine
      case "state"      => (q: Int, _: Int) => q
      case "symbol"     => (_: Int, sym: Int) => sym
      case "pitilde"    => (q: Int, sym: Int) => p.pitilde(q)(sym)
      case "next_state" => (q: Int, sym: Int) => p.conn(q)(sym)
      case "sym_frq"    => (_: Int, sym: Int) => p.symFrq(sym)
      case other => throw new IllegalArgumentException(s"unknown pfsa column $other")
    }
    for {
      q <- p.conn.indices.iterator
      sym <- (0 until p.alphabetSize).iterator
    } yield InternalRow.fromSeq(extract.toSeq.map(f => f(q, sym)))
  }

  private var cur: InternalRow = _
  override def next(): Boolean = rows.hasNext && { cur = rows.next(); true }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

// ------------------------------------------------------------- write path

/** Write side of the connector: `df.write.format("pfsa").save(dir)` turns
  * transition rows back into one `.pfsa` file per machine. The machinery
  * is the part worth having on Spark: the Write declares
  * `RequiresDistributionAndOrdering` — CLUSTERED by `machine`, sorted by
  * (machine, state, symbol) — and Spark plans the shuffle + sort itself,
  * so every machine arrives whole and ordered at exactly one writer, at
  * any input partitioning. Writers stage `.<machine>.pfsa.<task>.staged`
  * files and the driver-side commit renames them into place (truncating
  * stale `*.pfsa` first under SaveMode.Overwrite via SupportsTruncate);
  * abort deletes the staged files — the usual two-phase file protocol.
  * The table view carries the transition structure only: `ann_err`,
  * `mrg_eps`, `syn_str` write as their defaults (the codec's scalars are
  * model-fit metadata, not transitions). */
class PfsaWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(schema.fieldNames.toSeq == PfsaSource.Schema.fieldNames.toSeq &&
    schema.fields.map(_.dataType).toSeq == PfsaSource.Schema.fields.map(_.dataType).toSeq,
    s"pfsa write needs the canonical schema ${PfsaSource.Schema.simpleString}, got ${schema.simpleString}")
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new PfsaWrite(path, doTruncate)
}

class PfsaWrite(path: String, doTruncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("machine")))
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.identity("machine"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("state"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("symbol"), SortDirection.ASCENDING))

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new PfsaBatchWrite(path, doTruncate)
}

/** One (staged, final) rename per machine file, carried back to the
  * driver for the two-phase commit. */
case class PfsaCommit(pairs: Seq[(String, String)])
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class PfsaBatchWrite(path: String, doTruncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PfsaWriterFactory(path, conf)

  private val conf = PfsaSource.sessionConfMap()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = PfsaSource.fsOf(path, conf)
    fs.mkdirs(p)
    // the committed set is authoritative: under truncate, sweep stale
    // model files AND any .staged debris a crashed executor left behind
    // (its abort() never ran; nothing else ever deletes those)
    // compare staged files by NAME: listStatus returns scheme-qualified
    // paths (file:/...) while the writers recorded raw strings
    val committedStages = messages.collect {
      case PfsaCommit(pairs) =>
        pairs.map { case (staged, _) => new org.apache.hadoop.fs.Path(staged).getName }
    }.flatten.toSet
    if (doTruncate && fs.exists(p))
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && (n.endsWith(".pfsa") ||
            (n.endsWith(".staged") && !committedStages.contains(n))))
          fs.delete(st.getPath, false)
      }
    messages.foreach {
      case PfsaCommit(pairs) => pairs.foreach { case (staged, fin) =>
        val f = new org.apache.hadoop.fs.Path(fin)
        if (fs.exists(f)) fs.delete(f, false)
        require(fs.rename(new org.apache.hadoop.fs.Path(staged), f),
          s"pfsa commit failed to rename $staged -> $fin")
      }
      case _ =>
    }
    // refresh the library manifest (read side plans from it without a
    // directory listing — the million-model path). Prior names under
    // append come from ONE directory listing (not the old manifest): the
    // listing costs this (rare) write one RPC and makes the refresh
    // SELF-HEALING in BOTH directions — names another concurrent append
    // renamed into place before our listing are re-absorbed instead of
    // lost-updated away, and a stale manifest name whose .pfsa was
    // deleted out-of-band drops out instead of being carried forward
    // forever into a planned-but-missing read partition (unioning the
    // old manifest would pin such ghosts permanently). The residual
    // race (a commit whose renames land after our listing but whose
    // manifest write lands before ours) still last-wins — concurrent
    // writers to ONE library dir should coordinate, as with any
    // file-listing table format; readers are never torn (stage-and-rename
    // publish). Truncate starts from the committed set alone, since the
    // sweep above removed everything else.
    val committedNames = messages.collect {
      case PfsaCommit(pairs) => pairs.map { case (_, fin) =>
        new org.apache.hadoop.fs.Path(fin).getName.stripSuffix(".pfsa") }
    }.flatten.toSet
    val prior: Set[String] =
      if (doTruncate) Set.empty
      else
        fs.listStatus(p).iterator
          .filter(st => st.isFile && st.getPath.getName.endsWith(".pfsa"))
          .map(_.getPath.getName.stripSuffix(".pfsa")).toSet
    PfsaSource.writeManifest(fs, p, (prior ++ committedNames).toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = PfsaSource.fsOf(path, conf)
    messages.foreach {
      case PfsaCommit(pairs) => pairs.foreach { case (staged, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(staged), false)
      }
      case _ =>
    }
  }
}

class PfsaWriterFactory(path: String, conf: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new PfsaDataWriter(path, taskId, conf)
}

/** Streams the (machine, state, symbol)-ordered rows the required
  * distribution guarantees: on machine change, the accumulated matrix is
  * validated (complete S×A grid) and staged as one file. */
class PfsaDataWriter(path: String, taskId: Long, conf: Map[String, String])
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val fs = PfsaSource.fsOf(path, conf)
  fs.mkdirs(new org.apache.hadoop.fs.Path(path))

  private var cur: String = _
  private val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Int, Double)]
  private val staged = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  private def flush(): Unit = if (cur != null && rows.nonEmpty) {
    require(PfsaSource.validMachineName(cur),
      s"machine name cannot round-trip the manifest/file layout: '$cur' " +
        "(empty, edge whitespace, line breaks, and '/' are rejected)")
    val nStates = rows.iterator.map(r => math.max(r._1, r._4)).max + 1
    val nSyms = rows.iterator.map(_._2).max + 1
    require(rows.length == nStates * nSyms && rows.map(r => (r._1, r._2)).distinct.length == rows.length,
      s"machine $cur: transition grid is not a complete ${nStates}x$nSyms matrix")
    val pit = Array.ofDim[Double](nStates, nSyms)
    val conn = Array.ofDim[Int](nStates, nSyms)
    val frq = new Array[Double](nSyms)
    rows.foreach { case (q, sym, p, nxt, f) =>
      pit(q)(sym) = p; conn(q)(sym) = nxt; if (q == 0) frq(sym) = f
    }
    // sym_frq is a per-SYMBOL quantity replicated across states in the
    // table view; silently keeping state 0's copy would make an
    // inconsistent input a lossy write — reject it instead
    rows.foreach { case (q, sym, _, _, f) =>
      require(java.lang.Double.doubleToLongBits(f)
          == java.lang.Double.doubleToLongBits(frq(sym)),
        s"machine $cur: sym_frq for symbol $sym differs between state 0 and state $q")
    }
    val machine = graft.core.Pfsa(conn = conn, pitilde = pit, symFrq = frq,
      annErr = 0.0, mrgEps = 0.0, synStr = None)
    val fin = new org.apache.hadoop.fs.Path(path, s"$cur.pfsa")
    val stage = new org.apache.hadoop.fs.Path(path, s".$cur.pfsa.$taskId.staged")
    val out = fs.create(stage, true)
    try out.write(machine.toText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    staged += ((stage.toString, fin.toString))
    rows.clear()
  }

  override def write(row: InternalRow): Unit = {
    val m = row.getUTF8String(0).toString
    if (m != cur) { flush(); cur = m }
    rows += ((row.getInt(1), row.getInt(2), row.getDouble(3), row.getInt(4), row.getDouble(5)))
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    flush()
    PfsaCommit(staged.toSeq)
  }

  override def abort(): Unit =
    staged.foreach { case (s, _) => fs.delete(new org.apache.hadoop.fs.Path(s), false) }

  override def close(): Unit = ()
}
