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
}
