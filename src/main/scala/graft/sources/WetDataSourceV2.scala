package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 for WET (WARC conversion) files:
  *
  *   spark.read.format("graft.sources.wet")
  *     .option("minChars", "200").option("maxFiles", "5")
  *     .load("/path/to/wet-dir")
  *
  * The natural unit of parallelism is one file per `InputPartition`
  * (CommonCrawl shards at ~70 MB gzip per file, reference:
  * download-cc.sh:1-10), which matches the hand-rolled
  * `createDataset(paths).flatMap` path in [[WetSource]] — this V2
  * implementation adds catalog/schema integration so WET directories
  * behave like any other table source (usable from SQL via
  * `CREATE TABLE ... USING graft.sources.wet`). Parsing is delegated to
  * [[WetSource.parseFile]], so both read paths share one parser and its
  * truncation/stream-lifecycle handling.
  */
class wet extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "wet"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WetTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WetTable(properties.asScala.toMap)
}

object WetTable {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("source_path", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def configFrom(options: Map[String, String]): WetSource.WetConfig =
    WetSource.WetConfig(
      minChars = options.get("minchars").map(_.toInt).getOrElse(200),
      maxChars = options.get("maxchars").map(_.toInt).getOrElse(200000),
      maxDocsPerFile = options.get("maxdocsperfile").map(_.toInt).getOrElse(Int.MaxValue))
}

class WetTable(properties: Map[String, String]) extends Table with SupportsRead {
  private val props = properties.map { case (k, v) => k.toLowerCase -> v }

  override def name(): String = s"wet(${props.getOrElse("path", "?")})"
  override def schema(): StructType = WetTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = props ++ options.asScala.map { case (k, v) => k.toLowerCase -> v }
    new WetScanBuilder(merged)
  }
}

class WetScanBuilder(options: Map[String, String]) extends ScanBuilder {
  override def build(): Scan = new WetScan(options)
}

case class WetFilePartition(path: String) extends InputPartition

class WetScan(options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = WetTable.schema
  override def toBatch: Batch = this
  override def description(): String = s"WetScan(${options.getOrElse("path", "")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("wet source requires a load path"))
    val maxFiles = options.get("maxfiles").map(_.toInt).getOrElse(Int.MaxValue)
    val f = new java.io.File(path)
    val files =
      if (f.isFile) Seq(f.getAbsolutePath)
      else WetSource.discover(path, maxFiles = maxFiles)
    files.map(WetFilePartition.apply).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WetReaderFactory(options)
}

class WetReaderFactory(options: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WetFilePartition]
    val cfg = WetTable.configFrom(options)
    new PartitionReader[InternalRow] {
      private val it = WetSource.parseFile(p.path, cfg)
      private var current: WetSource.WetDoc = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current.doc_id), UTF8String.fromString(current.url),
        UTF8String.fromString(current.warc_date), UTF8String.fromString(current.source_path),
        UTF8String.fromString(current.text))
      override def close(): Unit = ()
    }
  }
}
