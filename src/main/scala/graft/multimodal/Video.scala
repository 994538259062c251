package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded video metadata. */
final case class VideoMeta(doc_id: Long, byte_len: Int, width: Int,
    height: Int, fps_num: Int, fps_den: Int, n_frames: Int, checksum: Long)

/** One decoded frame's pixel bytes (grayscale, width*height). */
final case class VideoFrame(doc_id: Long, frame_idx: Int, pixels: Array[Byte])

/** Video as opaque BINARY columns: the third leg of the multimodal layer
  * — images ([[Multimodal]], P6 PPM), audio ([[Audio]], RIFF/WAVE PCM),
  * and now frame sequences as REAL YUV4MPEG2 (Y4M) containers, the one
  * video format decodable in pure Scala with no codec dependency (an
  * ASCII stream header, then `FRAME\n`-delimited raw rasters — the
  * interchange format mjpegtools/ffmpeg use for uncompressed video).
  * [[Video.Y4mCodec]] is a genuine decoder: it tokenizes the stream
  * header (parameter order is free per the spec, unknown `X` parameters
  * are skipped), validates W/H/F, accepts exactly the mono colorspace it
  * can size frames for, then walks every FRAME marker and its raster
  * with exact bounds. Swapping it for an ffmpeg/JNI call changes nothing
  * around it — schema, encoders, per-partition batch decode, the
  * codegen'd frame hash, the lag-window shot detector and the banded
  * near-dup join are the production shape. Fixture blobs are
  * deterministically ENCODED from document text (this container ships no
  * media files), so the SQL oracle re-derives every frame byte from the
  * text and pins the encode∘decode round-trip.
  */
object Video {

  /** Y4M (YUV4MPEG2) mono codec — no stub. Encode writes the canonical
    * stream header `YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 Cmono\n` and one
    * `FRAME\n` + w*h raster per frame; decode is STRICTER than the
    * encoder's output shape: free parameter order, skipped X-extensions,
    * optional FRAME parameters — but a malformed or truncated container,
    * a missing mandatory parameter, or a colorspace this decoder cannot
    * size frames for is an ERROR. A real decoder rejects, it does not
    * guess. */
  object Y4mCodec {

    private val Magic = "YUV4MPEG2"

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Y4M: $msg")

    /** Canonical mono container. */
    def encode(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(fpsNum > 0 && fpsDen > 0, s"bad frame rate $fpsNum:$fpsDen")
      require(frames.nonEmpty, "at least one frame")
      frames.foreach(f => require(f.length == w * h,
        s"frame has ${f.length} bytes, want ${w * h}"))
      val header = s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
        .getBytes("US-ASCII")
      val frameMark = "FRAME\n".getBytes("US-ASCII")
      val out = new Array[Byte](
        header.length + frames.size * (frameMark.length + w * h))
      System.arraycopy(header, 0, out, 0, header.length)
      var off = header.length
      frames.foreach { f =>
        System.arraycopy(frameMark, 0, out, off, frameMark.length)
        off += frameMark.length
        System.arraycopy(f, 0, out, off, f.length)
        off += f.length
      }
      out
    }

    /** Parse the stream header; return (w, h, fpsNum, fpsDen, frameLen,
      * first-frame offset). Parameters may appear in any order; `X`
      * extensions are skipped; W, H and F are mandatory. Colorspaces this
      * decoder can size frames for: `mono` (frameLen = w·h) and the
      * 4:2:0 family `420`/`420jpeg`/`420mpeg2`/`420paldv` (frameLen =
      * w·h·3/2 — full luma plane + two half-resolution chroma planes;
      * even dimensions required, as every real 4:2:0 writer emits). A
      * missing C parameter means 4:2:0 per the YUV4MPEG2 spec's default.
      * Anything else would be mis-sliced, so it is rejected, not guessed
      * at. */
    def parseHeader(blob: Array[Byte]): (Int, Int, Int, Int, Int, Int) = {
      val nl = blob.indexOf('\n'.toByte)
      if (nl < 0) fail("no stream-header terminator")
      val header = new String(blob, 0, nl, "US-ASCII")
      val toks = header.split(" ")
      if (toks.isEmpty || toks(0) != Magic) fail(s"bad magic (want $Magic)")
      var w = -1; var h = -1; var fn = -1; var fd = -1
      var cs: String = null
      toks.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
        val v = t.substring(1)
        t.charAt(0) match {
          case 'W' => w = v.toInt
          case 'H' => h = v.toInt
          case 'F' =>
            val c = v.split(":")
            if (c.length != 2) fail(s"bad frame rate '$v' (want n:d)")
            fn = c(0).toInt; fd = c(1).toInt
          case 'C' => cs = v
          case 'I' | 'A' | 'X' => () // interlacing/aspect/extension: free
          case c => fail(s"unknown parameter '$c' in stream header")
        }
      }
      if (w <= 0) fail(s"missing or bad W (got $w)")
      if (h <= 0) fail(s"missing or bad H (got $h)")
      if (fn <= 0 || fd <= 0) fail(s"missing or bad F (got $fn:$fd)")
      val frameLen = cs match {
        case "mono" => w * h
        case null | "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
          if (w % 2 != 0 || h % 2 != 0)
            fail(s"4:2:0 needs even dimensions (got ${w}x$h)")
          w * h * 3 / 2
        case other => fail(s"colorspace '$other' (mono and 4:2:0 only)")
      }
      (w, h, fn, fd, frameLen, nl + 1)
    }

    /** Walk the FRAME sequence; return each frame's raster offset.
      * Frame markers may carry their own parameters (`FRAME Xfoo\n`);
      * every raster must fit, and the walk must land exactly on the
      * container end (no trailing junk, no truncated last frame).
      * Returns (w, h, fpsNum, fpsDen, frameLen, offsets). */
    def frameOffsets(blob: Array[Byte]): (Int, Int, Int, Int, Int, Array[Int]) = {
      val (w, h, fn, fd, frameLen, off0) = parseHeader(blob)
      val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = off0
      while (i < blob.length) {
        // "FRAME" + optional " <params>" + '\n'
        if (i + 5 > blob.length ||
            new String(blob, i, 5, "US-ASCII") != "FRAME")
          fail(s"expected FRAME marker at $i")
        var j = i + 5
        while (j < blob.length && blob(j) != '\n'.toByte) j += 1
        if (j >= blob.length) fail(s"unterminated FRAME header at $i")
        if (j > i + 5 && blob(i + 5) != ' '.toByte)
          fail(s"junk after FRAME marker at $i")
        val body = j + 1
        if (body + frameLen > blob.length)
          fail(s"truncated frame at $body (want $frameLen bytes)")
        offs += body
        i = body + frameLen
      }
      if (offs.isEmpty) fail("container has no frames")
      (w, h, fn, fd, frameLen, offs.toArray)
    }

    /** Decode metadata: header fields, frame count from the walk,
      * checksum from the one LUMA-plane pass (sum of each frame's first
      * w·h bytes mod 2^16 — for mono that is the whole raster; for
      * 4:2:0 the chroma planes are walked for sizing but excluded from
      * the hashable content, the same luma-only convention the frame
      * hashes use). */
    def decode(blob: Array[Byte]): (Int, Int, Int, Int, Int, Long) = {
      val (w, h, fn, fd, _, offs) = frameOffsets(blob)
      val lumaLen = w * h
      var sum = 0L
      offs.foreach { o =>
        var i = o
        while (i < o + lumaLen) { sum += blob(i) & 0xFF; i += 1 }
      }
      (w, h, fn, fd, offs.length, sum % 65536)
    }

    /** The decoded LUMA planes after the validated walk (for mono, the
      * full rasters) — the plane every perceptual-hash operator reads. */
    def frames(blob: Array[Byte]): Array[Array[Byte]] = {
      val (w, h, _, _, _, offs) = frameOffsets(blob)
      offs.map(o => java.util.Arrays.copyOfRange(blob, o, o + w * h))
    }

    /** Canonical 4:2:0 container (`C420jpeg`, the spec's default): each
      * frame is w·h luma bytes + two (w/2)·(h/2) chroma planes packed
      * plane-sequentially — w·h·3/2 bytes. Even dimensions required. */
    def encode420(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
        s"4:2:0 needs positive even dimensions (got ${w}x$h)")
      require(fpsNum > 0 && fpsDen > 0, s"bad frame rate $fpsNum:$fpsDen")
      require(frames.nonEmpty, "at least one frame")
      val frameLen = w * h * 3 / 2
      frames.foreach(f => require(f.length == frameLen,
        s"frame has ${f.length} bytes, want $frameLen"))
      val header = s"$Magic W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
      val frameMark = "FRAME\n".getBytes("US-ASCII")
      val out = new Array[Byte](
        header.length + frames.size * (frameMark.length + frameLen))
      System.arraycopy(header, 0, out, 0, header.length)
      var off = header.length
      frames.foreach { f =>
        System.arraycopy(frameMark, 0, out, off, frameMark.length)
        off += frameMark.length
        System.arraycopy(f, 0, out, off, f.length)
        off += f.length
      }
      out
    }
  }

  /** Build the video table: each document's text deterministically
    * ENCODED as a real Y4M mono container. Fixture math (all
    * SQL-derivable; empty text encodes a single space; ASCII corpus =>
    * char == byte): w = 4 + first byte mod 5, h = 4 + len mod 5,
    * n_frames = 3 + first byte mod 6, fps = (10 + len mod 15) : (1 +
    * len mod 2). Frame k's raster is the text repeated cyclically
    * starting at byte offset 29·[k >= n_frames/2] mod len — two static
    * shots with one offset jump at the midpoint, so every fixture video
    * contains exactly one genuine cut for the shot detector to find (a
    * per-frame pan would defeat the point: dHash is shift-sensitive, so
    * panning reads as a cut at EVERY frame). */
  def videoTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        when(length(col("text")) > 0, col("text")).otherwise(lit(" ")).as("s"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, s) =>
          val bytes = s.getBytes("UTF-8")
          val n = bytes.length
          val w = 4 + (bytes(0) & 0xFF) % 5
          val h = 4 + n % 5
          val nFrames = 3 + (bytes(0) & 0xFF) % 6
          val fpsNum = 10 + n % 15
          val fpsDen = 1 + n % 2
          val cut = nFrames / 2
          val frames = (0 until nFrames).map { k =>
            val off = (if (k >= cut) 29 else 0) % n
            val f = new Array[Byte](w * h)
            var i = 0
            while (i < f.length) { f(i) = bytes((i + off) % n); i += 1 }
            f
          }
          MediaBlob(id, "video/y4m", Y4mCodec.encode(w, h, fpsNum, fpsDen, frames))
        }
      }.toDF()
  }

  /** The 4:2:0 sibling of [[videoTable]]: same fixture math with the
    * dimensions rounded DOWN to even (w = (4 + first byte mod 5) - its
    * parity, likewise h — SQL-derivable as `w0 - w0 % 2`), the same
    * cyclic-text luma planes, and neutral-gray (0x80) chroma planes —
    * chroma carries no fixture information because the decode contract
    * (and the oracle) hash luma only; what the chroma bytes DO exercise
    * is the 4:2:0 frame sizing of the walk (w·h·3/2 per record). */
  def videoTable420(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        when(length(col("text")) > 0, col("text")).otherwise(lit(" ")).as("s"))
      .as[(Long, String)].mapPartitions { it =>
        it.map { case (id, s) =>
          val bytes = s.getBytes("UTF-8")
          val n = bytes.length
          val w0 = 4 + (bytes(0) & 0xFF) % 5
          val h0 = 4 + n % 5
          val w = w0 - w0 % 2
          val h = h0 - h0 % 2
          val nFrames = 3 + (bytes(0) & 0xFF) % 6
          val fpsNum = 10 + n % 15
          val fpsDen = 1 + n % 2
          val cut = nFrames / 2
          val frames = (0 until nFrames).map { k =>
            val off = (if (k >= cut) 29 else 0) % n
            val f = new Array[Byte](w * h * 3 / 2)
            var i = 0
            while (i < w * h) { f(i) = bytes((i + off) % n); i += 1 }
            java.util.Arrays.fill(f, w * h, f.length, 0x80.toByte)
            f
          }
          MediaBlob(id, "video/y4m", Y4mCodec.encode420(w, h, fpsNum, fpsDen, frames))
        }
      }.toDF()
  }

  /** Decode metadata with a per-partition batch loop ([[Multimodal
    * .decodeMeta]]'s shape — one codec instance per partition, rows
    * streamed through it). */
  def decodeVideoMeta(blobs: DataFrame): Dataset[VideoMeta] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        val (w, h, fn, fd, nf, sum) = Y4mCodec.decode(b.blob)
        VideoMeta(b.doc_id, b.blob.length, w, h, fn, fd, nf, sum)
      }
    }
  }

  /** Decode frames — the boundary every frame-space operator shares:
    * one row per (blob, frame), batched per partition. */
  def decodeFrames(blobs: DataFrame): Dataset[VideoFrame] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.flatMap { b =>
        Y4mCodec.frames(b.blob).iterator.zipWithIndex.map {
          case (f, k) => VideoFrame(b.doc_id, k, f)
        }
      }
    }
  }

  /** Per-frame perceptual hashes: the codec runs in mapPartitions
    * ([[decodeFrames]]), the hash stays the native codegen'd dHash
    * expression over the decoded pixel bytes — the same split the image
    * layer uses ([[Multimodal.perceptualHash]]).
    * Output: (doc_id, frame_idx, fhash). */
  def frameHashes(blobs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    decodeFrames(blobs).toDF().select(col("doc_id"), col("frame_idx"),
      ColumnBridge.column(graft.functions.DHash32(
        ColumnBridge.expression(col("pixels")))).as("fhash"))
  }

  /** Shot-boundary detection: frames whose perceptual hash sits >=
    * minHamming bits from the PREVIOUS frame's — the cut detector a
    * frame-sampling pipeline runs before picking keyframes. Declarative
    * on purpose: one per-video lag window over the frame-hash relation
    * (bounded by n_frames per video, never a sort of the corpus), so
    * Catalyst pipelines it straight onto the decode scan.
    * Output: (doc_id, frame_idx, hamming). */
  def shotBoundaries(blobs: DataFrame, minHamming: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frameHashes(blobs)
      .withColumn("prev", lag(col("fhash"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"), col("frame_idx"),
        bit_count(col("fhash").bitwiseXOR(col("prev"))).as("hamming"))
      .filter(col("hamming") >= minHamming)
  }

  /** Video near-duplicate pairs: candidates from per-frame banded hash
    * buckets (two 32-bit frame hashes within Hamming 3 agree on >= 1 of
    * 4 8-bit bands — pigeonhole, the [[Multimodal.nearDupMedia]] rule
    * applied per aligned frame), verified by exact aligned-frame
    * distance. The contract: report (a, b) when both videos have the
    * same frame count, SOME aligned frame pair sits within Hamming 3
    * (this is what makes banding complete), and the MEAN aligned
    * distance is <= maxMeanHamming. Candidates only ever come from
    * band-equal (frame_idx, band, bucket) buckets — never an all-pairs
    * join — and each candidate pair is verified with one aligned join
    * bounded by n_frames rows. Output: (doc_id_a, doc_id_b,
    * mean_hamming_e2 — integer centi-bits, SQL-exact). */
  def nearDupVideo(blobs: DataFrame, maxMeanHamming: Int = 2): DataFrame = {
    // referenced three times (banding + both verify sides); left
    // declarative like the image/audio banded joins — the decode is
    // map-side and Catalyst/AQE reuse or recompute the scan, never a
    // corpus-sized materialization
    val sigs = frameHashes(blobs)
    val nf = sigs.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val banded = sigs.select(col("doc_id"), col("frame_idx"), posexplode(
      array((0 until 4).map(b =>
        shiftrightunsigned(col("fhash"), b * 8).bitwiseAND(lit(0xFFL))): _*))
      .as(Seq("band", "bucket")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.frame_idx") === col("y.frame_idx") &&
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"))
      .distinct()
    cands
      .join(sigs.toDF("doc_id_a", "frame_idx", "ha"), "doc_id_a")
      .join(sigs.toDF("doc_id_b", "frame_idx", "hb"),
        Seq("doc_id_b", "frame_idx"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("n_aligned"), min(col("hamming")).as("min_h"),
        sum(col("hamming")).as("sum_h"))
      .join(nf.toDF("doc_id_a", "nf_a"), "doc_id_a")
      .join(nf.toDF("doc_id_b", "nf_b"), "doc_id_b")
      // same frame count => the aligned inner join covered every frame
      .filter(col("nf_a") === col("nf_b") && col("min_h") <= 3)
      .select(col("doc_id_a"), col("doc_id_b"),
        expr("sum_h * 100 div nf_a").as("mean_hamming_e2"))
      .filter(col("mean_hamming_e2") <= maxMeanHamming * 100)
  }
}
