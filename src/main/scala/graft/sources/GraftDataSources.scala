package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format(...)` registration — the reference's user-facing
  * entry point is `open_dataset(path)` (`/root/reference/README.md:59-62`,
  * Arrow's dataset API); the Spark spelling of the same ergonomics is a
  * DataSource name, so a SQL-only user never needs the object API:
  *
  *   - `spark.read.format("geoparquet").load(dir)` — full parquet scan
  *     machinery (predicate pushdown, column pruning, partition pruning,
  *     vectorized decode). Geometry columns surface as standard WKB
  *     `binary` — decode with `st_geomfromwkb`, or keep using
  *     [[GeoParquet.read]] for the metadata-attached object path.
  *   - `spark.read.format("arrowipc").load(dir)` — the scan-grade IPC
  *     reader: decode-level column pruning, optional record-batch task
  *     splitting (`option("maxBatchesPerTask", n)`), `_SUCCESS` gating
  *     (`option("requireSuccess", "false")` for foreign dirs).
  */

/** GeoParquet = parquet bytes + `geo` footer metadata, so the scan IS the
  * parquet scan: subclassing Spark's parquet DataSourceV2 under the
  * `geoparquet` name inherits the entire pushdown/pruning/vectorization
  * stack verbatim (and, unlike the built-in name, is not on the
  * `spark.sql.sources.useV1SourceList` fallback list, so it always plans
  * as a v2 BatchScan). The geo metadata itself is file-footer metadata the
  * scan does not need; [[GeoParquet.geoMetadataJson]] reads it. */
class GeoParquetDataSource
    extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetDataSourceV2 {
  override def shortName(): String = "geoparquet"
}

/** Arrow IPC DataSourceV2 (public connector API): one input partition per
  * part file — or per record-batch range when `maxBatchesPerTask` is set —
  * each reading through [[ArrowIpc.readFileRows]] (streamed batches,
  * typed columnar decode). Column pruning happens at decode level: the
  * scan's readSchema resolves vectors by name, so pruned columns are never
  * decoded (IPC batch bodies still transfer — the format has no column
  * projection on disk — but all per-value work is skipped). */
class ArrowIpcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrowipc"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: util.Map[String, String]): String = {
    val o = new CaseInsensitiveStringMap(options)
    val p = o.get("path")
    require(p != null && p.nonEmpty, "arrowipc: use .load(<path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowIpc.sparkSchemaOf(SparkSession.active, pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArrowIpcTable(pathOf(properties), schema,
      new CaseInsensitiveStringMap(properties))
}

private[sources] class ArrowIpcTable(path: String, tableSchema: StructType,
                                     options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"arrowipc $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(path, tableSchema, options)
}

private[sources] class ArrowIpcScanBuilder(path: String, fileSchema: StructType,
                                           options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fileSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands the minimal column set; resolve against the file
    // schema's field order for a stable layout
    required = StructType(fileSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ArrowIpcScan(path, required,
    options.getInt("maxBatchesPerTask", 0),
    options.getBoolean("requireSuccess", true))
}

private[sources] class ArrowIpcScan(path: String, required: StructType,
                                    maxBatchesPerTask: Int,
                                    requireSuccess: Boolean)
    extends Scan with Batch {
  // the session's hadoop conf, captured at plan time for executor-side
  // FileSystem access (same plumbing as ArrowIpc.read)
  private val entries: Map[String, String] = {
    val c = SparkSession.active.sessionState.newHadoopConf()
    c.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in explain(): the pruned column set is visible in the plan
  override def description(): String =
    s"arrowipc $path ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] = {
    if (requireSuccess) ArrowIpc.checkSuccessMarker(path, entries)
    ArrowIpc.planSplits(path, entries, maxBatchesPerTask)
      .map { case (f, a, b) => ArrowIpcInputPartition(f, a, b): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowIpcReaderFactory(required, entries)
}

private[sources] case class ArrowIpcInputPartition(file: String, batchFrom: Int,
                                                   batchUntil: Int)
    extends InputPartition

private[sources] class ArrowIpcReaderFactory(schema: StructType,
                                             entries: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ArrowIpcInputPartition]
    val rows = ArrowIpc.readFileRows(part.file, schema, entries,
      part.batchFrom, part.batchUntil)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          current = toCatalyst(rows.next()).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = () // readFileRows self-closes at
      // exhaustion and registers a task-completion listener for early exit
    }
  }
}
