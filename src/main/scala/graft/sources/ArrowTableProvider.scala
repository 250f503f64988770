package graft.sources

import graft.readers.ArrowIPC
import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 TableProvider for Arrow IPC directories:
  * `spark.read.format("graft.sources.ArrowTableProvider").load(dir)`.
  *
  * The full custom-source mechanism from the preference order (SURVEY §4
  * item 5 "DataSource V2 TableProvider — only for exotic sources"): one
  * InputPartition per file, schema inferred from the first file's
  * header, executor-side decode to InternalRow. Column pruning happens
  * via the projected schema Catalyst puts above the scan; a
  * SupportsPushDownRequiredColumns refinement is the natural next step.
  */
class ArrowTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ArrowTableProvider.listFiles(options.get("path"))
    require(files.nonEmpty, s"no arrow files at ${options.get("path")}")
    ArrowTableProvider.schemaOf(files.head)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table =
    new ArrowTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object ArrowTableProvider {
  private[sources] def listFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, new Configuration())
    val status = fs.getFileStatus(p)
    if (status.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && Seq(".arrow", ".feather", ".ipc").exists(s.getPath.getName.endsWith))
        .map(_.getPath.toString)
    else Seq(path)
  }

  private[sources] def readBytes(url: String): Array[Byte] = {
    val p = new Path(url)
    val fs = FileSystem.get(p.toUri, new Configuration())
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private[sources] def schemaOf(file: String): StructType = {
    val (fields, _) = ArrowIPC.decode(readBytes(file))
    StructType(fields.map(f => StructField(f.getName, arrowToSpark(f), nullable = true)))
  }

  private def arrowToSpark(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case _: ArrowType.Int                        => IntegerType
      case fp: ArrowType.FloatingPoint =>
        if (fp.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE) FloatType else DoubleType
      case _: ArrowType.Utf8   => StringType
      case _: ArrowType.Bool   => BooleanType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.List   => ArrayType(arrowToSpark(f.getChildren.get(0)))
      case other               => throw new UnsupportedOperationException(s"arrow type $other")
    }
  }

  private[sources] def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                => null
    case (s: String, StringType)  => UTF8String.fromString(s)
    case (seq: Seq[_], ArrayType(et, _)) =>
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(seq.map(toCatalyst(_, et)).toArray)
    case (x, _)                   => x
  }
}

private class ArrowTable(schema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"arrow:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowScanBuilder(schema, Option(options.get("path")).getOrElse(path))
}

private class ArrowScanBuilder(schema: StructType, path: String) extends ScanBuilder {
  override def build(): Scan = new ArrowScan(schema, path)
}

private class ArrowScan(val readSchema: StructType, path: String) extends Scan with Batch {
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ArrowTableProvider.listFiles(path).map(f => ArrowFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new ArrowReaderFactory(readSchema)
}

private case class ArrowFilePartition(file: String) extends InputPartition

private class ArrowReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ArrowFilePartition].file
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[Seq[Any]] = ArrowIPC.decode(ArrowTableProvider.readBytes(file))._2.iterator
      private var current: Seq[Any] = _
      override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
      override def get(): InternalRow =
        InternalRow.fromSeq(current.zip(schema.fields).map { case (v, f) => ArrowTableProvider.toCatalyst(v, f.dataType) })
      override def close(): Unit = ()
    }
  }
}
