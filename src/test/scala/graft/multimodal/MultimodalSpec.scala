package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Scala-side mirror of the blobTable encode, for expected values. */
  private def encode(text: String): (Int, Int, Array[Byte]) = {
    val s = if (text.nonEmpty) text else " "
    val w = 8 + (s.charAt(0).toInt % 8)
    val h = 8 + (s.length % 8)
    val plen = w * h * 3
    val payload = (s * ((plen + s.length - 1) / s.length)).substring(0, plen)
    (w, h, payload.getBytes("UTF-8"))
  }

  test("blobTable emits a well-formed P6 container the codec round-trips") {
    val blob = Multimodal.blobTable(docs((7L, "AB"))).collect().head
      .getAs[Array[Byte]]("blob")
    // header is genuinely self-describing ASCII
    val (w, h, payload) = encode("AB") // w = 8 + 65%8 = 9, h = 8 + 2 = 10
    assert(w == 9 && h == 10)
    assert(new String(blob.take(10), "UTF-8") == "P6\n9 10\n255".take(10))
    val (dw, dh, off) = Multimodal.PpmCodec.parseHeader(blob)
    assert(dw == w && dh == h)
    assert(blob.drop(off).toSeq == payload.toSeq)
  }

  test("PpmCodec is a real decoder: rejects malformed, tolerates comments") {
    def enc(s: String) = s.getBytes("UTF-8")
    // comment + mixed whitespace in the header parse fine (netpbm spec)
    val ok = enc("P6 # a comment\n2\t1 255\n") ++ Array.fill(6)('x'.toByte)
    assert(Multimodal.PpmCodec.decode(ok) == ((2, 1, 6L * 'x')))
    def rejects(b: Array[Byte]) =
      intercept[IllegalArgumentException](Multimodal.PpmCodec.decode(b))
    rejects(enc("P5\n1 1\n255\n") ++ Array.fill(3)('x'.toByte)) // wrong magic
    rejects(enc("P6\n1 1\n255\n") ++ Array.fill(2)('x'.toByte)) // truncated raster
    rejects(enc("P6\n1 1\n255\n") ++ Array.fill(4)('x'.toByte)) // trailing junk
    rejects(enc("P6\n1 1\n65535\n") ++ Array.fill(3)('x'.toByte)) // 16-bit maxval
    rejects(enc("P6\n0 1\n255\n")) // degenerate dims
    rejects(enc("P6\n1 x\n255\n")) // non-numeric header
    // Int-wrap adversary: 2^20 x 2^20 passes the per-dimension guard and
    // w*h*3 = 3*2^40 wraps to 0 in Int — the header-only blob must still
    // reject (raster length validated in Long)
    rejects(enc("P6\n1048576 1048576\n255\n"))
  }

  test("decodeMeta recovers dimensions and checksum by decoding the bytes") {
    val r = Multimodal.decodeMeta(Multimodal.blobTable(docs((7L, "AB"))))
      .collect().head
    val (w, h, payload) = encode("AB")
    assert(r.doc_id == 7L && r.width == w && r.height == h)
    // header "P6\n9 10\n255\n" = 12 bytes + raster
    assert(r.byte_len == 12 + payload.length)
    assert(r.checksum == payload.map(_ & 0xFF).map(_.toLong).sum % 65536)
  }

  test("sampleFrames emits one frame per 128 raster bytes with leading byte") {
    // "x"*300: w = 8 + 120%8 = 8, h = 8 + 300%8 = 12, raster = 288 bytes
    val r = Multimodal.sampleFrames(Multimodal.blobTable(docs((1L, "x" * 300))))
      .collect().map(x => (x.getInt(1), x.getInt(2), x.getInt(3)))
    assert(r.toSeq == Seq((0, 0, 'x'.toInt), (1, 128, 'x'.toInt), (2, 256, 'x'.toInt)))
  }

  test("empty text still encodes a VALID container (single-space cycle)") {
    // "" -> " ": w = 8 + 32%8 = 8, h = 9, raster = 216 spaces -> 2 frames
    val r = Multimodal.sampleFrames(Multimodal.blobTable(docs((1L, ""))))
      .collect().map(x => (x.getInt(1), x.getInt(3)))
    assert(r.toSeq == Seq((0, ' '.toInt), (1, ' '.toInt)))
  }

  test("resizePlan fits into the box aspect-preserving, downscale only") {
    // 'o' = 111, 111%8 = 7 -> w = 15; len 7 -> h = 15: downscale to 12x12
    val meta = Multimodal.decodeMeta(Multimodal.blobTable(docs((1L, "o" * 7))))
    val r = Multimodal.resizePlan(meta, maxDim = 12).collect().head
    assert(r.getInt(1) == 15 && r.getInt(2) == 15)
    assert(r.getInt(3) == 12 && r.getInt(4) == 12)
    // small media pass through untouched (no upscale): w = 9, h = 9
    val small = Multimodal.decodeMeta(Multimodal.blobTable(docs((2L, "a"))))
    val s = Multimodal.resizePlan(small, maxDim = 12).collect().head
    assert(s.getInt(3) == 9 && s.getInt(4) == 9)
  }

  test("extractFeatures emits a complete byte histogram per decoded raster") {
    val r = Multimodal.extractFeatures(Multimodal.blobTable(docs((1L, "AAB"), (2L, ""))))
      .collect().map(f => (f.doc_id, f.bucket, f.n_bytes)).sorted
    assert(r.length == 32) // 16 buckets per doc, zeros included
    // doc 1: w=9, h=11, raster=297 = "AAB"*99 -> 'A'(bucket 1) 198, 'B'(2) 99
    assert(r.count { case (d, b, n) => d == 1L && b == 1 && n == 198L } == 1)
    assert(r.count { case (d, b, n) => d == 1L && b == 2 && n == 99L } == 1)
    // doc 2: 216 spaces -> bucket 0 = 216, rest 0
    assert(r.count { case (d, b, n) => d == 2L && b == 0 && n == 216L } == 1)
    assert(r.filter(x => x._1 == 2L && x._2 > 0).forall(_._3 == 0L))
  }

  test("dHash32: gradient-sign bits; in-place edit moves few bits, empty is 0") {
    val asc = ("a" * 10 + ('a' to 'z').mkString + "a" * 10).getBytes("UTF-8")
    val h = Multimodal.dHash32(asc)
    assert(h >= 0L) // 32 bits always fit positive
    assert(Multimodal.dHash32(Array.empty[Byte]) == 0L)
    // one in-place byte change, same length -> few gradient bits flip
    val edited = asc.clone(); edited(15) = 'Z'.toByte
    assert(java.lang.Long.bitCount(h ^ Multimodal.dHash32(edited)) <= 3)
    // a length change shifts every sample (documented tradeoff)
    assert(Multimodal.dHash32(asc) == h) // determinism
  }

  test("nearDupMedia == all pairs at raster-dHash Hamming <= 3 (banding complete)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with other words entirely here"
    val texts = Seq((1L, base), (2L, other),
      (3L, base.substring(0, 20) + "X" + base.substring(21)))
    val got = Multimodal.nearDupMedia(Multimodal.blobTable(texts.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: exact dHash over the encoded raster, all pairs
    val hs = texts.map { case (id, t) =>
      id -> Multimodal.dHash32(encode(t)._3) }
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want)
    // the fixture must actually exercise a hit and a miss
    assert(want.contains((1L, 3L)) && !want.contains((1L, 2L)))
  }

  test("dhash32 is SQL-callable and matches the kernel (codegen path)") {
    import spark.implicits._
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    d.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text").cast("binary").as("blob"))
      .createOrReplaceTempView("blobs_v")
    val viaSql = spark.sql("SELECT dhash32(blob) AS h FROM blobs_v").head.getLong(0)
    val viaKernel = Multimodal.dHash32(
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    assert(viaSql == viaKernel)
  }
}
