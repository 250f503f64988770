package graft.inspect

import java.nio.{ByteBuffer, ByteOrder}

/** DICOM metadata parser (published DICOM PS3.10 file format; reference
  * datatypes.py:566 DICOM, read there via pydicom/imageio): 128-byte
  * preamble + `DICM`, then data elements — explicit-VR little-endian
  * for the group-0002 file meta, and whichever the meta's transfer
  * syntax declares afterwards (explicit or implicit VR little-endian).
  * The walk collects the identification/geometry tags `inspect` wants
  * and stops at PixelData — metadata only, like the GGUF/PMTiles
  * parsers.
  */
object DicomParser {

  // VRs whose length field is (2 reserved + u32); all others use u16
  private val LongVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")

  /** Transfer syntax UID for implicit VR little endian. */
  private val ImplicitVrLe = "1.2.840.10008.1.2"

  // tags that carry US (u16) values — needed to type implicit-VR data,
  // where the element carries no VR on the wire
  private val UsTags = Set((0x0028, 0x0002), (0x0028, 0x0010), (0x0028, 0x0011), (0x0028, 0x0100))

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
    var transferSyntax = ""
    var implicitVr = false
    var nElements = 0
    var pos = 132
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val group = bb.getShort(pos) & 0xffff
      val element = bb.getShort(pos + 2) & 0xffff
      // the file meta group ends where group != 0002: switch modes per
      // its declared transfer syntax
      if (!implicitVr && group != 0x0002 && transferSyntax == ImplicitVrLe) implicitVr = true
      if (group == 0x7fe0 && element == 0x0010) { done = true } // PixelData: stop
      else {
        val vr = if (implicitVr) "" else new String(bytes, pos + 4, 2, "ISO-8859-1")
        val (len, dataAt) =
          if (implicitVr) (bb.getInt(pos + 4).toLong & 0xffffffffL, pos + 8)
          else if (LongVRs.contains(vr)) (bb.getInt(pos + 8).toLong & 0xffffffffL, pos + 12)
          else if (vr.forall(c => c >= 'A' && c <= 'Z')) ((bb.getShort(pos + 6) & 0xffff).toLong, pos + 8)
          else return out.result() ++ Map("n_elements" -> nElements, "note" -> "unrecognized VR walk stopped")
        if (len == 0xffffffffL) {
          // undefined-length sequence: nested items need a full SQ walk
          return out.result() ++ Map("n_elements" -> nElements, "note" -> "undefined-length sequence stopped walk")
        }
        if (dataAt + len > bytes.length) done = true
        else {
          val isUs = if (implicitVr) UsTags.contains((group, element)) && len == 2 else vr == "US"
          Wanted.get((group, element)).foreach { name =>
            val value: Any =
              if (isUs) bb.getShort(dataAt) & 0xffff
              else if (vr == "UL") bb.getInt(dataAt).toLong & 0xffffffffL
              else new String(bytes, dataAt, len.toInt, "ISO-8859-1").replace("\u0000", "").trim
            out += name -> value
            if (name == "transfer_syntax") transferSyntax = value.toString
          }
          nElements += 1
          pos = dataAt + len.toInt
        }
      }
    }
    out.result() + ("n_elements" -> nElements)
  }
}
