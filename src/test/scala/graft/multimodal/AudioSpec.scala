package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Audio.WavCodec

class AudioSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Scala-side mirror of the audioTable fixture math, for expected values. */
  private def fixture(text: String): (Int, Array[Byte]) = {
    val s = if (text.nonEmpty) text else " "
    val b = s.getBytes("UTF-8")
    val n = 256 + ((b(0) & 0xFF) % 16) * 32
    val rate = 8000 + (b.length % 8) * 500
    (rate, Array.tabulate(n)(i => b(i % b.length)))
  }

  test("WavCodec round-trips encode -> decode bit-for-bit") {
    val samples = Array.tabulate(300)(i => ((i * 7) % 256).toByte)
    val blob = WavCodec.encode(11025, samples)
    assert(blob.length == 44 + 300)
    // the header is genuine RIFF: magic, form type, LE sizes
    assert(new String(blob.take(4), "US-ASCII") == "RIFF")
    assert(new String(blob.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, n, off) = WavCodec.parseHeader(blob)
    assert(rate == 11025 && n == 300 && off == 44)
    assert(WavCodec.samples(blob).toSeq == samples.toSeq)
  }

  test("WavCodec walks RIFF chunks: extra chunk + odd-size padding tolerated") {
    // hand-build RIFF [fmt ][LIST(3 bytes + pad)][data] — a decoder that
    // assumes the canonical 44-byte layout (data at offset 36) breaks here
    val samples = "abcdef".getBytes("US-ASCII")
    val canonical = WavCodec.encode(8000, samples)
    val fmt = canonical.slice(12, 36) // "fmt " + size + 16-byte body
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0) // padded
    val data = canonical.slice(36, canonical.length)
    val body = fmt ++ list ++ data
    val blob = new Array[Byte](12 + body.length)
    "RIFF".getBytes.copyToArray(blob, 0)
    val rs = blob.length - 8
    blob(4) = (rs & 0xFF).toByte; blob(5) = ((rs >> 8) & 0xFF).toByte
    blob(6) = ((rs >> 16) & 0xFF).toByte; blob(7) = ((rs >> 24) & 0xFF).toByte
    "WAVE".getBytes.copyToArray(blob, 8)
    body.copyToArray(blob, 12)
    val (rate, n, _) = WavCodec.parseHeader(blob)
    assert(rate == 8000 && n == 6)
    assert(WavCodec.samples(blob).toSeq == samples.toSeq)
  }

  test("WavCodec is a real decoder: rejects malformed containers") {
    val good = WavCodec.encode(8000, "abcdef".getBytes("US-ASCII"))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    def rejects(b: Array[Byte]) =
      intercept[IllegalArgumentException](WavCodec.decode(b))
    rejects(good.dropRight(1)) // truncated (riff size mismatch)
    rejects(good :+ 0.toByte) // trailing junk
    rejects(mutated(b => b(0) = 'X')) // bad magic
    rejects(mutated(b => b(8) = 'X')) // bad form type
    rejects(mutated(b => b(20) = 3)) // non-PCM format code
    rejects(mutated(b => b(22) = 2)) // stereo
    rejects(mutated(b => b(34) = 16)) // 16-bit samples
    rejects(mutated(b => b(28) = 0x41)) // inconsistent byte rate
    rejects(mutated(b => b(32) = 2)) // inconsistent block align
    rejects(mutated(b => b(40) = (b(40) + 1).toByte)) // data len != bytes present
    rejects(mutated(b => b(16) = 18)) // extended fmt chunk size
    rejects(Array[Byte]('R', 'I', 'F', 'F')) // far too short
  }

  test("audioTable emits a container the codec decodes to the fixture math") {
    val r = Audio.decodeAudioMeta(Audio.audioTable(docs((7L, "AB")))).collect().head
    val (rate, samples) = fixture("AB") // 'A'=65, 65%16=1 -> 288; len 2 -> 9000
    assert(rate == 9000 && samples.length == 288)
    assert(r.doc_id == 7L && r.sample_rate == rate && r.n_samples == 288)
    assert(r.byte_len == 44 + 288)
    assert(r.checksum == samples.map(_ & 0xFF).map(_.toLong).sum % 65536)
  }

  test("empty text still encodes a VALID container (single-space cycle)") {
    val r = Audio.decodeAudioMeta(Audio.audioTable(docs((1L, "")))).collect().head
    // ' '=32, 32%16=0 -> 256 samples of 0x20; len 1 -> rate 8500
    assert(r.sample_rate == 8500 && r.n_samples == 256)
    assert(r.checksum == 256L * 32 % 65536)
  }

  test("windowEnergy: sum of squared deviations per 16-sample window") {
    val r = Audio.windowEnergy(Audio.audioTable(docs((1L, "AB"))))
      .collect().map(e => (e.win_idx, e.energy)).toMap
    val (_, samples) = fixture("AB") // 288 samples -> 18 windows of 16
    assert(r.size == 18)
    val expected = samples.grouped(16).map(w =>
      w.map(s => { val d = (s & 0xFF) - 128; d.toLong * d }).sum).toSeq
    assert((0 until 18).map(r) == expected)
  }

  test("fingerprint equals energyHash over the ordered envelope") {
    val rows = Audio.windowEnergy(Audio.audioTable(docs((1L, "hello world"))))
      .collect().sortBy(_.win_idx).map(_.energy)
    val h = Audio.fingerprint(Audio.audioTable(docs((1L, "hello world"))))
      .collect().head.getLong(1)
    assert(h == Audio.energyHash(rows))
    // 32 bits: non-negative in any engine's 64-bit integer
    assert(h >= 0L && h < (1L << 32))
  }

  test("nearDupAudio matches the all-pairs Hamming filter (banding complete <= 3)") {
    // texts chosen so some pairs land inside the bound and others outside
    val d = docs((1L, "aaaa bbbb cccc"), (2L, "aaaa bbbb cccd"),
      (3L, "zzzz qqqq wwww"), (4L, "aaaa bbbb cccc extra tail"))
    val got = Audio.nearDupAudio(Audio.audioTable(d))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Audio.fingerprint(Audio.audioTable(d))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 3
    } yield (ia, ib, ham)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture should produce at least one pair")
  }
}
