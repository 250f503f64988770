package graft.inspect

/** ASDF metadata parser (published ASDF standard; reference
  * datatypes.py:558 ASDF, read there via the asdf library): the file
  * opens with `#ASDF x.y.z` version comments, a YAML tree document
  * terminated by `...`, then binary blocks each led by the 4-byte
  * magic `ÓBLK`. This summary reports the declared versions, the
  * top-level YAML keys and the binary block count/sizes — metadata
  * only, in the HeaderParsers convention.
  */
object AsdfParser {

  def parse(bytes: Array[Byte]): Map[String, Any] = {
    val text = new String(bytes, "ISO-8859-1")
    require(text.startsWith("#ASDF "), "not an ASDF file")
    val lines = text.linesIterator.toSeq
    val asdfVersion = lines.head.stripPrefix("#ASDF ").trim
    val standard = lines.find(_.startsWith("#ASDF_STANDARD "))
      .map(_.stripPrefix("#ASDF_STANDARD ").trim).getOrElse("")

    // YAML tree: first %YAML/--- block through the '...' terminator
    val treeEnd = lines.indexWhere(_.trim == "...")
    val tree = if (treeEnd == -1) Nil else lines.take(treeEnd)
    val topKeys = tree
      .filter(l => l.nonEmpty && !l.startsWith(" ") && !l.startsWith("#") &&
        !l.startsWith("%") && !l.startsWith("---") && l.contains(":"))
      .map(_.split(":")(0).trim)
      .filter(_.nonEmpty)

    // binary blocks: magic D3 "BLK", u16 header size, then the block
    // header whose used-size u64 sits at offset 14 within it
    val blocks = Seq.newBuilder[Long]
    var i = 0
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) == 0xd3 && bytes(i + 1) == 'B' && bytes(i + 2) == 'L' && bytes(i + 3) == 'K') {
        if (i + 6 <= bytes.length) {
          val headerSize = ((bytes(i + 4) & 0xff) << 8) | (bytes(i + 5) & 0xff)
          val usedAt = i + 6 + 14
          if (usedAt + 8 <= bytes.length) {
            val used = java.nio.ByteBuffer.wrap(bytes, usedAt, 8).getLong
            blocks += used
            i += 6 + headerSize + math.max(0, used.toInt)
          } else i += 4
        } else i += 4
      } else i += 1
    }
    val sizes = blocks.result()
    Map(
      "asdf_version" -> asdfVersion,
      "standard_version" -> standard,
      "tree_keys" -> topKeys,
      "n_blocks" -> sizes.length,
      "block_bytes" -> sizes.sum)
  }
}
