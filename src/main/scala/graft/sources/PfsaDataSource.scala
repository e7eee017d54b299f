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
  * exposes every `*.pfsa` machine under `dir` as a TABLE of transition
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
  /** One row per (state, symbol) transition of each machine. */
  val Schema: StructType = StructType(Seq(
    StructField("machine", StringType, nullable = false),
    StructField("state", IntegerType, nullable = false),
    StructField("symbol", IntegerType, nullable = false),
    StructField("pitilde", DoubleType, nullable = false),
    StructField("next_state", IntegerType, nullable = false),
    StructField("sym_frq", DoubleType, nullable = false)))
}

class PfsaTable(path: String) extends Table with SupportsRead {
  require(path != null, "pfsa source needs a load(path)")
  override def name(): String = s"pfsa:$path"
  override def schema(): StructType = PfsaSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PfsaScanBuilder(path)
}

class PfsaScanBuilder(path: String) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PfsaSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new PfsaScan(path, required)
}

class PfsaScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".pfsa"))
      .map(st => PfsaInputPartition(st.getPath.toString): InputPartition)
      .toArray
      .sortBy(_.asInstanceOf[PfsaInputPartition].file) // deterministic plan
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PfsaReaderFactory(required.fieldNames)
}

case class PfsaInputPartition(file: String) extends InputPartition

class PfsaReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PfsaPartitionReader(partition.asInstanceOf[PfsaInputPartition].file, fields)
}

/** Parses one machine file on the executor it was assigned to and emits
  * its transition rows, already projected to the pruned schema. */
class PfsaPartitionReader(file: String, fields: Array[String])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt) // model files are KBs
    val in = fs.open(hp)
    try in.readFully(0, buf) finally in.close()
    val text = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    val p = graft.core.Pfsa.fromText(text)
    val stem = hp.getName.stripSuffix(".pfsa")
    val machine = UTF8String.fromString(stem)
    for {
      q <- p.conn.indices.iterator
      sym <- (0 until p.alphabetSize).iterator
    } yield InternalRow.fromSeq(fields.toSeq.map {
      case "machine"    => machine
      case "state"      => q
      case "symbol"     => sym
      case "pitilde"    => p.pitilde(q)(sym)
      case "next_state" => p.conn(q)(sym)
      case "sym_frq"    => p.symFrq(sym)
      case other => throw new IllegalArgumentException(s"unknown pfsa column $other")
    })
  }

  private var cur: InternalRow = _
  override def next(): Boolean = rows.hasNext && { cur = rows.next(); true }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
