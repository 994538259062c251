package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decodeMeta derives deterministic metadata from bytes") {
    val r = Multimodal.decodeMeta(Multimodal.blobTable(docs((7L, "AB"))))
      .collect().head
    assert(r.doc_id == 7L && r.byte_len == 2)
    assert(r.width == 64 + 'A' % 64 && r.height == 64 + 'B' % 64)
    assert(r.checksum == 'A' + 'B')
  }

  test("sampleFrames emits one frame per 128 bytes with leading byte") {
    val text = "x" * 300 // 3 frames: offsets 0,128,256
    val r = Multimodal.sampleFrames(Multimodal.blobTable(docs((1L, text))))
      .collect().map(x => (x.getInt(1), x.getInt(2), x.getInt(3)))
    assert(r.toSeq == Seq((0, 0, 'x'.toInt), (1, 128, 'x'.toInt), (2, 256, 'x'.toInt)))
  }

  test("sampleFrames emits no frames for an empty blob") {
    // regression: sequence(0, -1) yields [0, -1] (descending), not []
    val r = Multimodal.sampleFrames(Multimodal.blobTable(docs((1L, ""), (2L, "y"))))
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(r.toSeq == Seq((2L, 0)))
  }

  test("resizePlan fits into the box aspect-preserving, downscale only") {
    import org.apache.spark.sql.SparkSession
    // widths/heights derive from the first two bytes: 'A'=65 -> 64+1=65
    val meta = Multimodal.decodeMeta(Multimodal.blobTable(docs((1L, "\u007f\u007fzz"))))
    val r = Multimodal.resizePlan(meta, maxDim = 64).collect().head
    // width = 64 + 127 % 64 = 127, height = 127: scale to 64x64
    assert(r.getInt(1) == 127 && r.getInt(2) == 127)
    assert(r.getInt(3) == 64 && r.getInt(4) == 64)
    // small media pass through untouched (no upscale)
    val small = Multimodal.decodeMeta(Multimodal.blobTable(docs((2L, "\u0000\u0000"))))
    val s = Multimodal.resizePlan(small, maxDim = 64).collect().head
    assert(s.getInt(3) == 64 && s.getInt(4) == 64) // 64+0%64 = 64 <= box
  }

  test("extractFeatures emits a complete byte histogram per blob") {
    val r = Multimodal.extractFeatures(Multimodal.blobTable(docs((1L, "AAB"), (2L, ""))))
      .collect().map(f => (f.doc_id, f.bucket, f.n_bytes)).sorted
    assert(r.length == 32) // 16 buckets per doc, zeros included
    // 'A'=65 -> bucket 1, 'B'=66 -> bucket 2
    assert(r.count { case (d, b, n) => d == 1L && b == 1 && n == 2L } == 1)
    assert(r.count { case (d, b, n) => d == 1L && b == 2 && n == 1L } == 1)
    assert(r.filter(_._1 == 2L).forall(_._3 == 0L))
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

  test("nearDupMedia finds the planted edited copy via banded search") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with other words entirely here"
    val docs = Seq((1L, base), (2L, other),
      (3L, base.substring(0, 20) + "X" + base.substring(21))) // near-dup of 1
      .toDF("doc_id", "text")
    val pairs = Multimodal.nearDupMedia(Multimodal.blobTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)))
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
