package graft.readers

import graft.SparkSpec
import graft.pipeline.Pipeline
import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float4Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import scala.jdk.CollectionConverters._

/** Shared fixture: writes a 3-column (id, name, score) Arrow IPC file. */
object ArrowIPCSpecHelpers {
  def writeArrowFile(path: String, ids: Seq[Long], names: Seq[String], score: Seq[Float]): Unit = {
    val alloc = new RootAllocator()
    val schema = new Schema(Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(new ArrowType.Utf8()), null),
      new Field("score", FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)), null)
    ).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val idV = root.getVector("id").asInstanceOf[BigIntVector]
    val nameV = root.getVector("name").asInstanceOf[VarCharVector]
    val scoreV = root.getVector("score").asInstanceOf[Float4Vector]
    idV.allocateNew(ids.size); nameV.allocateNew(); scoreV.allocateNew(ids.size)
    ids.indices.foreach { i =>
      idV.setSafe(i, ids(i)); nameV.setSafe(i, names(i).getBytes("UTF-8")); scoreV.setSafe(i, score(i))
    }
    root.setRowCount(ids.size)
    val out = new FileOutputStream(path)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    writer.start(); writer.writeBatch(); writer.end(); writer.close(); out.close()
    root.close(); alloc.close()
  }
}

class ArrowIPCSpec extends SparkSpec {
  import ArrowIPCSpecHelpers.writeArrowFile

  test("arrow IPC files read distributed with correct schema and values") {
    val dir = Files.createTempDirectory("arrow").toString
    writeArrowFile(s"$dir/a.arrow", Seq(1L, 2L), Seq("x", "y"), Seq(0.5f, 1.5f))
    writeArrowFile(s"$dir/b.arrow", Seq(3L), Seq("z"), Seq(2.5f))

    val df = ArrowIPC.read(spark, s"file://$dir")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq(("id", "bigint"), ("name", "string"), ("score", "float")))
    import spark.implicits._
    val rows = df.as[(Long, String, Float)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "x", 0.5f), (2L, "y", 1.5f), (3L, "z", 2.5f)))
  }

  test("LZ4_FRAME-compressed IPC batches decode (feather v2 compression default)") {
    // written by arrow-java's own writer with buffer compression — the
    // independent encoder; our reader must decompress via the bundled
    // arrow-compression factory rather than erroring on the codec id
    import org.apache.arrow.vector.compression.CompressionUtil
    import org.apache.arrow.compression.{CommonsCompressionFactory, Lz4CompressionCodec, ZstdCompressionCodec}
    import org.apache.arrow.vector.ipc.message.IpcOption
    val dir = Files.createTempDirectory("arrowlz4").toString
    for ((fname, codec) <- Seq(
        ("lz4.arrow", new Lz4CompressionCodec()),
        ("zstd.arrow", new ZstdCompressionCodec()))) {
      val alloc = new RootAllocator()
      val schema = new Schema(Seq(
        new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("name", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      val idV = root.getVector("id").asInstanceOf[BigIntVector]
      val nameV = root.getVector("name").asInstanceOf[VarCharVector]
      idV.allocateNew(3); nameV.allocateNew()
      (0 until 3).foreach { i => idV.setSafe(i, i + 1L); nameV.setSafe(i, s"row$i".getBytes("UTF-8")) }
      root.setRowCount(3)
      val out = new FileOutputStream(s"$dir/$fname")
      val writer = new ArrowFileWriter(root, null, out.getChannel, null,
        IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE, codec.getCodecType)
      writer.start(); writer.writeBatch(); writer.end(); writer.close(); out.close()
      root.close(); alloc.close()

      val (fields, rows) = ArrowIPC.decode(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$fname")))
      assert(fields.map(_.getName) == Seq("id", "name"))
      assert(rows.map(r => (r(0), r(1))).toSet == Set((1L, "row0"), (2L, "row1"), (3L, "row2")))
    }
  }

  test("detection + auto pipeline route .arrow files to the arrow reader") {
    val dir = Files.createTempDirectory("arrow2").toString
    writeArrowFile(s"$dir/t.arrow", Seq(7L), Seq("q"), Seq(9f))
    val p = Pipeline.auto(s"file://$dir/t.arrow")
    assert(p.source.name == "arrow_ipc_reader")
    assert(p.read(spark).count() == 1)
  }
}
