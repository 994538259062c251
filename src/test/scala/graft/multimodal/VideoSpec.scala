package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Video.Y4mCodec

class VideoSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Scala-side mirror of the videoTable fixture math, for expected values. */
  private def fixture(text: String): (Int, Int, Int, Int, Int, Seq[Array[Byte]]) = {
    val s = if (text.nonEmpty) text else " "
    val b = s.getBytes("UTF-8")
    val n = b.length
    val w = 4 + (b(0) & 0xFF) % 5
    val h = 4 + n % 5
    val nf = 3 + (b(0) & 0xFF) % 6
    val fn = 10 + n % 15
    val fd = 1 + n % 2
    val frames = (0 until nf).map { k =>
      val off = (if (k >= nf / 2) 29 else 0) % n
      Array.tabulate(w * h)(i => b((i + off) % n))
    }
    (w, h, fn, fd, nf, frames)
  }

  test("Y4mCodec round-trips encode -> decode bit-for-bit") {
    val frames = Seq(
      Array.tabulate(12)(i => (i * 7 % 256).toByte),
      Array.tabulate(12)(i => (i * 13 % 256).toByte))
    val blob = Y4mCodec.encode(4, 3, 25, 1, frames)
    // genuine Y4M: ASCII stream header, FRAME markers, raw rasters
    assert(new String(blob.take(9), "US-ASCII") == "YUV4MPEG2")
    val (w, h, fn, fd, offs) = Y4mCodec.frameOffsets(blob)
    assert(w == 4 && h == 3 && fn == 25 && fd == 1 && offs.length == 2)
    val back = Y4mCodec.frames(blob)
    assert(back.length == 2)
    assert(back(0).toSeq == frames(0).toSeq && back(1).toSeq == frames(1).toSeq)
  }

  test("Y4mCodec parses free parameter order, X-extensions, FRAME params") {
    // a header a canonical-layout-assuming parser would misread
    val raster = Array.tabulate(6)(_.toByte)
    val header = "YUV4MPEG2 Xsomething H2 F30:1 Cmono W3 A0:0\n".getBytes("US-ASCII")
    val fr = "FRAME Xtag\n".getBytes("US-ASCII")
    val blob = header ++ fr ++ raster
    val (w, h, fn, fd, nf, sum) = Y4mCodec.decode(blob)
    assert(w == 3 && h == 2 && fn == 30 && fd == 1 && nf == 1)
    assert(sum == raster.map(_ & 0xFF).sum.toLong % 65536)
  }

  test("Y4mCodec is a real decoder: rejects malformed containers") {
    val good = Y4mCodec.encode(4, 3, 25, 1,
      Seq(Array.tabulate(12)(_.toByte), Array.tabulate(12)(i => (i + 1).toByte)))
    def rejects(b: Array[Byte]) =
      intercept[IllegalArgumentException](Y4mCodec.decode(b))
    def ascii(s: String) = s.getBytes("US-ASCII")
    rejects(good.dropRight(1)) // truncated last frame
    rejects(good :+ 0x20.toByte) // trailing junk (not a FRAME marker)
    rejects(ascii("XUV4MPEG2 W4 H3 F25:1 Cmono\n") ++ good.drop(28)) // magic
    rejects(ascii("YUV4MPEG2 H3 F25:1 Cmono\n")) // missing W
    rejects(ascii("YUV4MPEG2 W4 F25:1 Cmono\n")) // missing H
    rejects(ascii("YUV4MPEG2 W4 H3 Cmono\n")) // missing F
    rejects(ascii("YUV4MPEG2 W4 H3 F25 Cmono\n")) // F not n:d
    rejects(ascii("YUV4MPEG2 W4 H3 F25:1 C420\n")) // unsupported colorspace
    rejects(ascii("YUV4MPEG2 W4 H3 F25:1\n")) // no C at all: frame size unknown
    rejects(ascii("YUV4MPEG2 W4 H3 F25:1 Cmono\n")) // zero frames
    rejects(ascii("YUV4MPEG2 W4 H3 F25:1 Cmono\nFRAMX\n") ++
      Array.fill(12)(0.toByte)) // bad frame marker
    rejects(ascii("YUV4MPEG2 W4 H3 F25:1 Cmono")) // unterminated header
  }

  test("videoTable emits a container the codec decodes to the fixture math") {
    val r = Video.decodeVideoMeta(Video.videoTable(docs((7L, "ABCDE"))))
      .collect().head
    val (w, h, fn, fd, nf, frames) = fixture("ABCDE")
    // 'A'=65: w = 4 + 65%5 = 4, nf = 3 + 65%6 = 8; len 5: h = 4, fps 15:2
    assert(w == 4 && h == 4 && nf == 8 && fn == 15 && fd == 2)
    assert(r.doc_id == 7L && r.width == w && r.height == h)
    assert(r.fps_num == fn && r.fps_den == fd && r.n_frames == nf)
    val headerLen = s"YUV4MPEG2 W$w H$h F$fn:$fd Ip A1:1 Cmono\n".length
    assert(r.byte_len == headerLen + nf * (6 + w * h))
    val sum = frames.map(_.map(b => (b & 0xFF).toLong).sum).sum % 65536
    assert(r.checksum == sum)
  }

  test("empty text still encodes a VALID container (single-space cycle)") {
    val r = Video.decodeVideoMeta(Video.videoTable(docs((1L, ""))))
      .collect().head
    // ' '=32: w = 4 + 32%5 = 6, nf = 3 + 32%6 = 5; len 1: h = 5, fps 11:2
    assert(r.width == 6 && r.height == 5 && r.n_frames == 5)
    assert(r.fps_num == 11 && r.fps_den == 2)
    assert(r.checksum == 5L * 30 * 32 % 65536)
  }

  test("frameHashes equals the dHash kernel over each decoded frame") {
    val t = "the quick brown fox jumps over the lazy dog"
    val got = Video.frameHashes(Video.videoTable(docs((1L, t))))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    val (_, _, _, _, nf, frames) = fixture(t)
    assert(got.size == nf)
    frames.zipWithIndex.foreach { case (f, k) =>
      assert(got(k) == graft.functions.DHash32.compute(f), s"frame $k")
      assert(got(k) >= 0L && got(k) < (1L << 32))
    }
  }

  test("shotBoundaries finds exactly the midpoint cut on a fixture video") {
    val t = "a corpus sentence long enough that the two shots differ clearly"
    val (_, _, _, _, nf, frames) = fixture(t)
    val hs = frames.map(graft.functions.DHash32.compute)
    val cut = nf / 2
    // fixture shots are static: within-shot consecutive distance is 0,
    // so the detector must report the cut frame alone (given its jump
    // actually clears the threshold on this text — assert it does)
    val cutDist = java.lang.Long.bitCount(hs(cut) ^ hs(cut - 1))
    assert(cutDist >= 8, s"fixture cut only $cutDist bits")
    val got = Video.shotBoundaries(Video.videoTable(docs((1L, t))))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((cut, cutDist)))
  }

  test("nearDupVideo reports the edited copy, not unrelated docs") {
    val base = "shared boilerplate paragraph that repeats across mirrors of a page"
    val edited = base.substring(0, 9) + "Z" + base.substring(10)
    val other = "completely different content with its own pixel statistics here"
    val d = docs((1L, base), (2L, edited), (3L, other))
    val got = Video.nearDupVideo(Video.videoTable(d))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "edited copy must pair with its source")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
    // verify the reported mean against the brute aligned computation
    val sigs = Video.frameHashes(Video.videoTable(d)).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2)) }
    val pair = Video.nearDupVideo(Video.videoTable(d)).collect()
      .find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    val (ha, hb) = (sigs(1L), sigs(2L))
    assert(ha.length == hb.length)
    val sum = ha.zip(hb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(pair.getLong(2) == sum.toLong * 100 / ha.length)
  }
}
