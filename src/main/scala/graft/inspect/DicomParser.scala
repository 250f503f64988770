package graft.inspect

import java.nio.{ByteBuffer, ByteOrder}

/** DICOM metadata parser (published DICOM PS3.10 file format; reference
  * datatypes.py:566 DICOM, read there via pydicom/imageio): 128-byte
  * preamble + `DICM`, then explicit-VR little-endian data elements. The
  * walk collects the identification/geometry tags `inspect` wants and
  * stops at PixelData — metadata only, like the GGUF/PMTiles parsers.
  */
object DicomParser {

  // VRs whose length field is (2 reserved + u32); all others use u16
  private val LongVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")

  private val Wanted: Map[(Int, Int), String] = Map(
    (0x0002, 0x0010) -> "transfer_syntax",
    (0x0008, 0x0020) -> "study_date",
    (0x0008, 0x0060) -> "modality",
    (0x0008, 0x0070) -> "manufacturer",
    (0x0010, 0x0010) -> "patient_name",
    (0x0010, 0x0020) -> "patient_id",
    (0x0020, 0x000D) -> "study_uid",
    (0x0028, 0x0002) -> "samples_per_pixel",
    (0x0028, 0x0010) -> "rows",
    (0x0028, 0x0011) -> "columns",
    (0x0028, 0x0100) -> "bits_allocated")

  def parse(bytes: Array[Byte]): Map[String, Any] = {
    require(bytes.length > 140 &&
      bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M',
      "not a DICOM part-10 file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Map.newBuilder[String, Any]
    var nElements = 0
    var pos = 132
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val group = bb.getShort(pos) & 0xffff
      val element = bb.getShort(pos + 2) & 0xffff
      if (group == 0x7fe0 && element == 0x0010) { done = true } // PixelData: stop
      else {
        val vr = new String(bytes, pos + 4, 2, "ISO-8859-1")
        val (len, dataAt) =
          if (LongVRs.contains(vr)) (bb.getInt(pos + 8).toLong, pos + 12)
          else if (vr.forall(c => c >= 'A' && c <= 'Z')) ((bb.getShort(pos + 6) & 0xffff).toLong, pos + 8)
          else return out.result() ++ Map("n_elements" -> nElements, "note" -> "implicit VR not walked")
        if (len < 0 || dataAt + len > bytes.length) done = true
        else {
          Wanted.get((group, element)).foreach { name =>
            val value: Any = vr match {
              case "US" => bb.getShort(dataAt) & 0xffff
              case "UL" => bb.getInt(dataAt).toLong & 0xffffffffL
              case _    => new String(bytes, dataAt, len.toInt, "ISO-8859-1").replace("\u0000", "").trim
            }
            out += name -> value
          }
          nElements += 1
          pos = dataAt + len.toInt
        }
      }
    }
    out.result() + ("n_elements" -> nElements)
  }
}
