package graft.ops

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** The JDK bundles a TIFF ImageIO plugin since Java 9, so the existing
  * decodeViaImageIo path handles TIFF with no extra code — this spec
  * pins that (the scaladoc previously understated it as stubbed).
  */
class TiffDecodeSpec extends AnyFunSuite {
  test("uncompressed TIFF decodes to real pixels through the ImageIO path") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, if (y == 0) 0xffffff else 0x000000)))
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", out), "JDK TIFF writer missing")
    val bytes = out.toByteArray
    val Some((fmt, w, h, rgb)) = Multimodal.decodeImage(bytes)
    assert((w, h) == (4, 2))
    assert((rgb(0) & 0xff) == 255 && (rgb(rgb.length - 1) & 0xff) == 0)
    val feats = Multimodal.poolFeatures(w, h, rgb, 2)
    assert(math.abs(feats(0) - 1.0f) < 0.01f && math.abs(feats(1) - 0.0f) < 0.01f)
  }
}
