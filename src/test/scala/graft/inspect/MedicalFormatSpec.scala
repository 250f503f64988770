package graft.inspect

import graft.SparkSpec
import graft.readers.NiftiReader
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** DICOM / NIfTI / WebP fixtures hand-encoded from the published specs. */
class MedicalFormatSpec extends SparkSpec {

  private def dicomElement(group: Int, element: Int, vr: String, value: Array[Byte]): Array[Byte] = {
    val longVr = Set("OB", "OW", "OF", "SQ", "UT", "UN").contains(vr)
    val padded = if (value.length % 2 == 1) value :+ ' '.toByte else value
    val bb = ByteBuffer.allocate(if (longVr) 12 else 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(group.toShort).putShort(element.toShort)
    bb.put(vr.getBytes("ISO-8859-1"))
    if (longVr) { bb.putShort(0); bb.putInt(padded.length) } else bb.putShort(padded.length.toShort)
    bb.array() ++ padded
  }

  test("DICOM metadata parses identification and geometry tags") {
    val out = new ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes("ISO-8859-1"))
    out.write(dicomElement(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1".getBytes))
    out.write(dicomElement(0x0008, 0x0060, "CS", "MR".getBytes))
    out.write(dicomElement(0x0010, 0x0010, "PN", "Doe^Jane".getBytes))
    out.write(dicomElement(0x0028, 0x0010, "US",
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(512).array()))
    out.write(dicomElement(0x0028, 0x0011, "US",
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(384).array()))
    out.write(dicomElement(0x7fe0, 0x0010, "OW", Array[Byte](1, 2, 3, 4)))

    val m = DicomParser.parse(out.toByteArray)
    assert(m("modality") == "MR")
    assert(m("patient_name") == "Doe^Jane")
    assert(m("rows") == 512 && m("columns") == 384)
    assert(m("transfer_syntax") == "1.2.840.10008.1.2.1")
    assert(m("n_elements") == 5) // PixelData stops the walk
    intercept[IllegalArgumentException](DicomParser.parse(new Array[Byte](200)))
  }

  test("DICOM implicit-VR elements walk after the meta group declares it") {
    def implicitElement(group: Int, element: Int, value: Array[Byte]): Array[Byte] = {
      val padded = if (value.length % 2 == 1) value :+ ' '.toByte else value
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(group.toShort).putShort(element.toShort).putInt(padded.length)
      bb.array() ++ padded
    }
    def u16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    val out = new ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes("ISO-8859-1"))
    // file meta group stays explicit VR; transfer syntax = implicit VR LE
    out.write(dicomElement(0x0002, 0x0010, "UI", "1.2.840.10008.1.2".getBytes))
    // dataset elements carry no VR on the wire
    out.write(implicitElement(0x0008, 0x0060, "CT".getBytes))
    out.write(implicitElement(0x0010, 0x0020, "P-123".getBytes))
    out.write(implicitElement(0x0028, 0x0010, u16(64)))
    out.write(implicitElement(0x0028, 0x0011, u16(32)))
    out.write(implicitElement(0x0028, 0x0100, u16(16)))
    out.write(implicitElement(0x7fe0, 0x0010, Array[Byte](9, 9)))

    val m = DicomParser.parse(out.toByteArray)
    assert(m("transfer_syntax") == "1.2.840.10008.1.2")
    assert(m("modality") == "CT" && m("patient_id") == "P-123")
    assert(m("rows") == 64 && m("columns") == 32 && m("bits_allocated") == 16)
    assert(m("n_elements") == 6) // PixelData stops the walk
  }

  test("NIfTI-1 voxels read long-form with slope/intercept scaling") {
    // 3x2x2 int16 volume, value = 10 + 0.5 * raw
    val hdr = ByteBuffer.allocate(348).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(0, 348)
    hdr.putShort(40, 3); hdr.putShort(42, 3); hdr.putShort(44, 2); hdr.putShort(46, 2)
    hdr.putShort(70, 4) // DT_INT16
    hdr.putShort(72, 16)
    hdr.putFloat(108, 352.0f) // vox_offset
    hdr.putFloat(112, 0.5f)   // scl_slope
    hdr.putFloat(116, 10.0f)  // scl_inter
    hdr.position(344); hdr.put("n+1".getBytes); hdr.put(0.toByte)
    val data = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 12).foreach(i => data.putShort((i * 2).toShort))
    val dir = Files.createTempDirectory("nifti")
    Files.write(dir.resolve("vol.nii"), hdr.array() ++ Array[Byte](0, 0, 0, 0) ++ data.array())

    val df = NiftiReader.read(spark, s"file://$dir/vol.nii")
    assert(df.columns.toSeq == Seq("dim0", "dim1", "dim2", "value"))
    import spark.implicits._
    val m = df.as[(Long, Long, Long, Double)].collect()
      .map { case (i, j, k, v) => (i, j, k) -> v }.toMap
    assert(m.size == 12)
    // fortran order: flat = i + 3*j + 6*k; value = 10 + 0.5 * (2*flat)
    assert(m((0L, 0L, 0L)) == 10.0)
    assert(m((2L, 1L, 0L)) == 10.0 + (2 + 3) * 1.0)
    assert(m((1L, 0L, 1L)) == 10.0 + (1 + 6) * 1.0)
  }

  test("WebP dims parse for lossy, lossless and extended layouts") {
    def riff(fourcc: String, chunk: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(20 + chunk.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(12 + chunk.length).put("WEBP".getBytes)
      bb.put(fourcc.getBytes).putInt(chunk.length).put(chunk)
      bb.array()
    }
    val vp8 = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    vp8.position(3); vp8.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
    vp8.putShort(320).putShort(240)
    assert(HeaderParsers.webpDims(riff("VP8 ", vp8.array())).contains((320, 240)))

    val vp8l = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    vp8l.put(0x2f.toByte).putInt(((99 & 0x3fff) << 14) | (199 & 0x3fff)) // w-1=199, h-1=99
    assert(HeaderParsers.webpDims(riff("VP8L", vp8l.array())).contains((200, 100)))

    val vp8x = new Array[Byte](10)
    vp8x(4) = 0x3f; vp8x(5) = 0; vp8x(6) = 0 // width-1 = 63
    vp8x(7) = 0x1f; vp8x(8) = 0; vp8x(9) = 0 // height-1 = 31
    assert(HeaderParsers.webpDims(riff("VP8X", vp8x)).contains((64, 32)))
    assert(HeaderParsers.webpDims("RIFFxxxxJUNK".getBytes).isEmpty)
  }
}
