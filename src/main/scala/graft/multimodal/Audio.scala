package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded audio metadata. */
final case class AudioMeta(doc_id: Long, byte_len: Int, sample_rate: Int,
    n_samples: Int, checksum: Long)

/** A blob's decoded PCM samples (unsigned 8-bit, mono). */
final case class AudioSamples(doc_id: Long, samples: Array[Byte])

/** One window of an audio blob's energy envelope. */
final case class AudioEnergy(doc_id: Long, win_idx: Int, energy: Long)

/** A blob's 32-bit energy-gradient fingerprint. */
final case class AudioHash(doc_id: Long, ahash: Long)

/** Audio as opaque BINARY columns: the WAV/RIFF twin of the image layer
  * ([[Multimodal]]). Blobs are REAL RIFF/WAVE PCM containers (the one
  * audio format decodable in pure Scala with no codec dependency) and
  * [[Audio.WavCodec]] is a genuine decoder: a RIFF chunk walk (word-
  * aligned, as the spec requires) that locates `fmt ` and `data`,
  * validates every little-endian field of the PCM format block, and
  * walks the samples. Swapping it for a libsndfile/JNI call changes
  * nothing around it — schema, encoders, per-partition batch iteration
  * and the banded near-dup join are the production shape. Fixture blobs
  * are deterministically ENCODED from document text (this container
  * ships no media files), so the SQL oracle can re-derive the payload
  * and every decoded field from the text and pin the encode∘decode
  * round-trip.
  */
object Audio {

  /** PCM u8 mono WAV codec — no stub. Encode writes the canonical
    * 44-byte RIFF header; decode is STRICTER than the encoder's output
    * shape: it walks RIFF chunks (tolerating extra chunks and the
    * mandatory odd-size pad byte) and cross-validates every redundant
    * header field (riff size, byte rate, block align, data length). A
    * malformed container is an ERROR — a real decoder rejects, it does
    * not guess. */
  object WavCodec {

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV: $msg")

    private def u16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

    private def u32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** Canonical 44-byte-header PCM u8 mono container. */
    def encode(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val out = new Array[Byte](44 + samples.length)
      def putTag(i: Int, s: String): Unit = {
        var k = 0; while (k < 4) { out(i + k) = s.charAt(k).toByte; k += 1 }
      }
      def put16(i: Int, v: Int): Unit = {
        out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
      }
      def put32(i: Int, v: Long): Unit = {
        out(i) = (v & 0xFF).toByte
        out(i + 1) = ((v >> 8) & 0xFF).toByte
        out(i + 2) = ((v >> 16) & 0xFF).toByte
        out(i + 3) = ((v >> 24) & 0xFF).toByte
      }
      putTag(0, "RIFF"); put32(4, 36L + samples.length); putTag(8, "WAVE")
      putTag(12, "fmt "); put32(16, 16L)
      put16(20, 1) // PCM
      put16(22, 1) // mono
      put32(24, sampleRate.toLong)
      put32(28, sampleRate.toLong) // byte rate = rate * channels * bytes/sample
      put16(32, 1) // block align
      put16(34, 8) // bits per sample
      putTag(36, "data"); put32(40, samples.length.toLong)
      System.arraycopy(samples, 0, out, 44, samples.length)
      out
    }

    /** Chunk-walk parse; return (sampleRate, nSamples, dataOffset).
      * Validates the RIFF frame, the full PCM `fmt ` block (u8 mono,
      * consistent byte rate and block align) and the `data` length. */
    def parseHeader(blob: Array[Byte]): (Int, Int, Int) = {
      if (blob.length < 44) fail(s"container too short (${blob.length} bytes)")
      if (tag(blob, 0) != "RIFF") fail("bad magic (want RIFF)")
      if (u32(blob, 4) != blob.length - 8L)
        fail(s"riff size ${u32(blob, 4)} != ${blob.length - 8}")
      if (tag(blob, 8) != "WAVE") fail("bad form type (want WAVE)")
      var rate = -1; var dataOff = -1; var dataLen = -1L
      var i = 12
      // RIFF chunk walk: [id:4][size:4][payload:size][pad to even]
      while (i + 8 <= blob.length) {
        val id = tag(blob, i)
        val size = u32(blob, i + 4)
        val body = i + 8
        if (size < 0 || body + size > blob.length)
          fail(s"chunk '$id' overruns container (size $size at $i)")
        if (id == "fmt ") {
          if (size != 16) fail(s"fmt chunk size $size (want 16 = plain PCM)")
          if (u16(blob, body) != 1) fail(s"audio format ${u16(blob, body)} (want 1 = PCM)")
          if (u16(blob, body + 2) != 1) fail(s"${u16(blob, body + 2)} channels (mono only)")
          rate = u32(blob, body + 4).toInt
          if (rate <= 0) fail(s"bad sample rate $rate")
          if (u16(blob, body + 14) != 8) fail(s"${u16(blob, body + 14)}-bit samples (u8 only)")
          if (u32(blob, body + 8) != rate.toLong)
            fail(s"byte rate ${u32(blob, body + 8)} != $rate for u8 mono")
          if (u16(blob, body + 12) != 1)
            fail(s"block align ${u16(blob, body + 12)} (want 1 for u8 mono)")
        } else if (id == "data") {
          if (rate < 0) fail("data chunk before fmt")
          dataOff = body; dataLen = size
        }
        i = body + size.toInt + (size.toInt & 1) // spec: chunks word-aligned
      }
      // the chunk walk already bounds every chunk inside the container;
      // requiring the walk to land EXACTLY on the end closes the other
      // direction (no unclaimed trailing bytes after the last chunk)
      if (i != blob.length) fail(s"trailing junk after last chunk at $i")
      if (rate < 0) fail("missing fmt chunk")
      if (dataOff < 0) fail("missing data chunk")
      (rate, dataLen.toInt, dataOff)
    }

    /** Decode metadata: rate and sample count from the header, checksum
      * from the one sample walk (sum of sample bytes mod 2^16). */
    def decode(blob: Array[Byte]): (Int, Int, Long) = {
      val (rate, n, off) = parseHeader(blob)
      var sum = 0L
      var i = off
      while (i < off + n) { sum += blob(i) & 0xFF; i += 1 }
      (rate, n, sum % 65536)
    }

    /** The decoded PCM samples after the validated header. */
    def samples(blob: Array[Byte]): Array[Byte] = {
      val (_, n, off) = parseHeader(blob)
      java.util.Arrays.copyOfRange(blob, off, off + n)
    }
  }

  /** Build the audio table: each document's text deterministically
    * ENCODED as a real RIFF/WAVE PCM container. The fixture parameters
    * are integer functions of the text (n_samples = 256 + 32·(first
    * byte mod 16), sample_rate = 8000 + 500·(length mod 8)) and the
    * samples are the text bytes repeated cyclically to n_samples — all
    * SQL-derivable, so the oracle re-derives every decoded field from
    * the text while the Spark side must recover them from the BINARY
    * little-endian header it wrote. Empty text encodes as a single
    * space. ASCII corpus => char == byte throughout. */
  def audioTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        when(length(col("text")) > 0, col("text")).otherwise(lit(" ")).as("s"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, s) =>
          val bytes = s.getBytes("UTF-8")
          val nSamples = 256 + ((bytes(0) & 0xFF) % 16) * 32
          val rate = 8000 + (bytes.length % 8) * 500
          val samples = new Array[Byte](nSamples)
          var i = 0
          while (i < nSamples) { samples(i) = bytes(i % bytes.length); i += 1 }
          MediaBlob(id, "audio/wav", WavCodec.encode(rate, samples))
        }
      }.toDF()
  }

  /** Decode metadata with a per-partition batch loop ([[Multimodal
    * .decodeMeta]]'s shape — one codec instance per partition, rows
    * streamed through it). */
  def decodeAudioMeta(blobs: DataFrame): Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        val (rate, n, sum) = WavCodec.decode(b.blob)
        AudioMeta(b.doc_id, b.blob.length, rate, n, sum)
      }
    }
  }

  /** Decode PCM samples — the boundary every waveform operator shares. */
  def decodeSamples(blobs: DataFrame): Dataset[AudioSamples] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map(b => AudioSamples(b.doc_id, WavCodec.samples(b.blob)))
    }
  }

  /** Per-window energy over decoded samples: Σ (s − 128)² per `win`
    * samples (u8 PCM centers at 128; the last window may be partial;
    * 16 samples per window keeps the envelope >= 16 windows on even the
    * smallest fixture blob — enough gradient structure that 32 hash bits
    * stay discriminative instead of collapsing into mass collisions) —
    * the energy envelope a waveform fingerprint summarizes, computed in
    * the same per-partition batch loop a real feature model would use.
    * Integer-exact: ≤ 128²·win per window, nowhere near int64.
    * Output: (doc_id, win_idx, energy). */
  def windowEnergy(blobs: DataFrame, win: Int = 16): Dataset[AudioEnergy] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.flatMap { b =>
        val s = WavCodec.samples(b.blob)
        energies(s, win).zipWithIndex.iterator.map { case (e, w) =>
          AudioEnergy(b.doc_id, w, e)
        }
      }
    }
  }

  /** The envelope kernel shared by [[windowEnergy]] and [[fingerprint]]. */
  private def energies(s: Array[Byte], win: Int): Array[Long] = {
    val nw = (s.length + win - 1) / win
    val e = new Array[Long](nw)
    var i = 0
    while (i < s.length) {
      val d = (s(i) & 0xFF) - 128
      e(i / win) += d.toLong * d
      i += 1
    }
    e
  }

  /** 32-bit energy-gradient hash: the sign of the envelope gradient
    * between 33 evenly-sampled windows — the audio twin of the image
    * dHash ([[graft.functions.DHash32]]'s sampling formula over window
    * energies instead of pixel bytes), so near-identical waveforms land
    * within a small Hamming distance. */
  def energyHash(e: Array[Long]): Long = {
    val n = e.length
    if (n == 0) return 0L
    var h = 0L
    var prev = e(0)
    var i = 1
    while (i <= 32) {
      val cur = e((i * (n - 1)) / 32)
      if (cur > prev) h |= 1L << (i - 1)
      prev = cur
      i += 1
    }
    h
  }

  /** Per-blob fingerprints: decode → envelope → gradient hash in ONE
    * per-partition pass — fully map-side (no shuffle anywhere), the
    * property that makes fingerprinting a 100 TB corpus a single scan.
    * Output: (doc_id, ahash). */
  def fingerprint(blobs: DataFrame, win: Int = 16): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map(b => AudioHash(b.doc_id,
        energyHash(energies(WavCodec.samples(b.blob), win))))
    }.toDF()
  }

  /** Audio near-duplicate pairs with Hamming distance <= maxHamming over
    * the energy-gradient fingerprint — the banded self-join shared with
    * image dedup ([[Multimodal.nearDupMedia]]): two 32-bit hashes at
    * distance <= 3 agree on >= 1 of 4 8-bit bands (pigeonhole), so only
    * band-equal buckets are probed, never all pairs.
    * Output: (doc_id_a, doc_id_b, hamming). */
  def nearDupAudio(blobs: DataFrame, maxHamming: Int = 3,
      win: Int = 16): DataFrame = {
    require(maxHamming <= 3,
      s"4x8-bit banding is complete only for Hamming distance <= 3; " +
        s"maxHamming=$maxHamming would silently miss pairs — add bands instead")
    val sigs = fingerprint(blobs, win)
    val banded = sigs.select(col("doc_id"), col("ahash"), posexplode(
      array((0 until 4).map(b =>
        shiftrightunsigned(col("ahash"), b * 8).bitwiseAND(lit(0xFFL))): _*))
      .as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
