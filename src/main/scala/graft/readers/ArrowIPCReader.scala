package graft.readers

import graft.datatypes.DataRef
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowStreamReader}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable.ListBuffer

/** Arrow IPC (Feather v2 / .arrow) reader built on the Arrow Java vector
  * library bundled with Spark. Files are distributed as binary blobs
  * (`binaryFile` scan) and decoded per-file on the executors — each
  * worker decodes whole files in parallel, nothing funnels through the
  * driver (the reference delegates this to pyarrow,
  * reference intake/readers/readers.py:1829 PyArrowIPCReader, with the
  * same file-vs-stream probing).
  *
  * Covers the common scalar types + list-of-float (embeddings); schema
  * comes from reading the first file's header on the driver.
  */
object ArrowIPC {

  private[readers] def arrowToSparkType(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case i: ArrowType.Int                        => IntegerType
      case fp: ArrowType.FloatingPoint =>
        if (fp.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE) FloatType else DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.List =>
        ArrayType(arrowToSparkType(f.getChildren.get(0)))
      case other => throw new UnsupportedOperationException(s"arrow type $other")
    }
  }

  private def cellValue(v: ValueVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector   => x.get(i)
      case x: IntVector      => x.get(i)
      case x: SmallIntVector => x.get(i).toInt
      case x: Float8Vector   => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: VarCharVector  => new String(x.get(i), "UTF-8")
      case x: BitVector      => x.get(i) == 1
      case x: VarBinaryVector => x.get(i)
      case x: ListVector =>
        val inner = x.getDataVector
        val start = x.getOffsetBuffer.getInt(i.toLong * 4)
        val end = x.getOffsetBuffer.getInt((i + 1).toLong * 4)
        (start until end).map(j => cellValue(inner, j))
      case other => throw new UnsupportedOperationException(s"arrow vector ${other.getClass}")
    }

  /** Decode one IPC payload (file format, falling back to stream format —
    * the same heuristic as the reference's PyArrowIPCReader) to rows.
    */
  def decode(bytes: Array[Byte]): (Seq[org.apache.arrow.vector.types.pojo.Field], Seq[Seq[Any]]) = {
    val alloc = new RootAllocator()
    try {
      val rows = ListBuffer[Seq[Any]]()
      def drain(root: VectorSchemaRoot): Seq[org.apache.arrow.vector.types.pojo.Field] = {
        val fields = root.getSchema.getFields
        (0 until root.getRowCount).foreach { i =>
          rows += (0 until fields.size()).map(c => cellValue(root.getVector(c), i))
        }
        fields.asInstanceOf[java.util.List[org.apache.arrow.vector.types.pojo.Field]].toArray
          .toSeq.map(_.asInstanceOf[org.apache.arrow.vector.types.pojo.Field])
      }
      val isFile = bytes.length >= 6 && new String(bytes, 0, 6, "ISO-8859-1") == "ARROW1"
      if (isFile) {
        val ch = new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes))
        // CommonsCompressionFactory decodes LZ4_FRAME/ZSTD body buffers
        // (feather v2 written with compression=, the pyarrow default for
        // write_feather); uncompressed batches pass through untouched
        val reader = new ArrowFileReader(ch, alloc,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
        try {
          var fields: Seq[org.apache.arrow.vector.types.pojo.Field] = Nil
          while (reader.loadNextBatch()) fields = drain(reader.getVectorSchemaRoot)
          if (fields.isEmpty)
            fields = reader.getVectorSchemaRoot.getSchema.getFields.toArray.toSeq
              .map(_.asInstanceOf[org.apache.arrow.vector.types.pojo.Field])
          (fields, rows.toSeq)
        } finally reader.close()
      } else {
        val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
        try {
          var fields: Seq[org.apache.arrow.vector.types.pojo.Field] = Nil
          while (reader.loadNextBatch()) fields = drain(reader.getVectorSchemaRoot)
          if (fields.isEmpty)
            fields = reader.getVectorSchemaRoot.getSchema.getFields.toArray.toSeq
              .map(_.asInstanceOf[org.apache.arrow.vector.types.pojo.Field])
          (fields, rows.toSeq)
        } finally reader.close()
      }
    } finally alloc.close()
  }

  def read(spark: SparkSession, pathOrGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{arrow,feather,ipc}")
      .load(pathOrGlob)
      .select("content")
    // schema from the first file, decoded on the driver (header-cheap)
    val first = files.limit(1).collect()
    require(first.nonEmpty, s"no arrow files at $pathOrGlob")
    val (fields, _) = decode(first.head.getAs[Array[Byte]](0))
    val schema = StructType(fields.map(f => StructField(f.getName, arrowToSparkType(f), nullable = true)))
    val rowsRdd = files.rdd.flatMap { r =>
      val (_, rows) = decode(r.getAs[Array[Byte]](0))
      rows.map(Row.fromSeq)
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

/** Registry wrapper so the catalog/pipeline layers can plan Arrow reads. */
class ArrowIPCReaderImpl extends Reader {
  val name = "arrow_ipc_reader"
  val implementsKinds = Set("arrow_ipc", "feather") // feather v2 IS the IPC file format
  def read(spark: SparkSession, ref: DataRef): DataFrame = ArrowIPC.read(spark, ref.url)
}
