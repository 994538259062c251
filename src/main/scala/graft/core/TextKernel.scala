package graft.core

/** Pure string kernels shared by the RDF transforms. */
object TextKernel {

  /** Fold every non-ASCII char into a run of ASCII chars by emitting its
    * low 7 bits repeatedly until the code point is exhausted (little-endian
    * 7-bit chunking). ASCII strings pass through unchanged (same reference:
    * operators/AsciifyTriples.scala:17-37 — behavior matched exactly,
    * including chunk order).
    */
  def asciify(s: String): String = {
    var pos = 0
    val n = s.length
    while (pos < n && s.charAt(pos) <= 0x7f) pos += 1
    if (pos == n) return s
    val sb = new java.lang.StringBuilder(n + 8)
    sb.append(s, 0, pos)
    while (pos < n) {
      var c = s.charAt(pos).toInt
      do {
        sb.append((c & 0x7f).toChar)
        c = c >>> 7
      } while (c != 0)
      pos += 1
    }
    sb.toString
  }

  /** MD5 of a string, folded to a short ASCII-safe token of `len` chars by
    * masking each digest byte to 7 bits (reference util/HashFunction.scala
    * role: compact deterministic dictionary hashes). Stable across JVMs. */
  def md5Ascii(s: String, len: Int = 8): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](math.min(len, digest.length))
    var i = 0
    while (i < out.length) {
      out(i) = (digest(i) & 0x7f).toChar
      i += 1
    }
    new String(out)
  }
}
