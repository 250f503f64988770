package graft.core

import java.security.MessageDigest

/** Content-addressed identity for catalog entities, mirroring the
  * reference's Tokenizable (reference intake/readers/utils.py:249-283):
  * every description hashes to a stable 16-hex-char token used for
  * equality, dedup and cross-entry references.
  *
  * The reference hashes a Python repr; bit-compatibility is impossible
  * (SURVEY §7 "Hard parts"), so we define canonical-JSON MD5 and treat
  * foreign tokens as opaque keys when reading reference catalogs.
  */
object Token {
  // Per-thread reusable MD5 for per-row executor loops: getInstance
  // does a provider lookup per call (~1 µs), measurable when a UDF
  // digests every row (or every shingle) of a corpus — q78/q79/q82's
  // map sides. Returned reset; callers may digest repeatedly (digest()
  // itself resets between uses).
  private val tlMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** A reset, thread-confined MD5 instance (do not retain across threads). */
  def md5(): MessageDigest = { val m = tlMd5.get(); m.reset(); m }

  def md5Hex(s: String): String =
    md5().digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical JSON: keys sorted, no whitespace, stable scalar forms. */
  def canonicalJson(v: Any): String = v match {
    case null           => "null"
    case s: String      => "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean     => b.toString
    case i: Int         => i.toString
    case l: Long        => l.toString
    case d: Double      => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case m: Map[_, _]   =>
      m.toSeq.map { case (k, x) => (k.toString, x) }.sortBy(_._1)
        .map { case (k, x) => canonicalJson(k) + ":" + canonicalJson(x) }
        .mkString("{", ",", "}")
    case it: Iterable[_] => it.map(canonicalJson).mkString("[", ",", "]")
    case other          => canonicalJson(other.toString)
  }

  def of(qname: String, attrs: Map[String, Any]): String =
    md5Hex(qname + "|" + canonicalJson(attrs)).take(16)
}

trait Tokenizable {
  /** Qualified name identifying the entity's kind. */
  def qname: String
  /** Attributes participating in identity (public state only). */
  def tokenAttrs: Map[String, Any]
  final def token: String = Token.of(qname, tokenAttrs)
}
