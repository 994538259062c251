package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media blob with typed metadata. */
final case class MediaBlob(doc_id: Long, media_type: String, blob: Array[Byte])

/** Decoded media metadata. */
final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
    checksum: Long)

/** A blob's decoded raster (the pixel bytes after the container header). */
final case class MediaPixels(doc_id: Long, pixels: Array[Byte])

/** One bucket of a raster's byte histogram (feature vector, exploded to
  * scalar rows so the oracle can hash-compare it). */
final case class MediaFeatures(doc_id: Long, bucket: Int, n_bytes: Long)

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, decode / feature-extract / frame-sample as mapPartitions over
  * typed Datasets.
  *
  * The media format is REAL: blobs are binary P6 PPM containers (magic +
  * ASCII header + raw RGB raster — the one self-describing image format
  * decodable in pure Scala with no codec dependency), and [[PpmCodec]] is a
  * genuine decoder: it parses the header byte-by-byte (whitespace- and
  * comment-tolerant, as the netpbm spec requires), validates the raster
  * length, and walks the pixels. Swapping it for a libjpeg/JNI call changes
  * nothing around it — the schema, encoders, partition-batched iteration
  * and frame fan-out are the production shape. The fixture blobs are
  * deterministically ENCODED from document text (this container ships no
  * media files), so the SQL oracle can reconstruct the same container and
  * verify that decode round-trips encode bit-for-bit.
  */
object Multimodal {

  /** Real P6 PPM decoder — no stub: magic check, whitespace/`#`-comment
    * tolerant ASCII header (width, height, maxval), exactly one separator
    * byte before the raster, raster length validated against w*h*3. A
    * malformed container is an ERROR (a real decoder rejects, it does not
    * guess); keep the try in the caller if skip-bad-media semantics are
    * wanted. */
  object PpmCodec {

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM: $msg")

    /** Parse the header; return (width, height, raster offset). */
    def parseHeader(blob: Array[Byte]): (Int, Int, Int) = {
      if (blob.length < 2 || blob(0) != 'P' || blob(1) != '6')
        fail("bad magic (want P6)")
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < blob.length) {
          val b = blob(i)
          if (b == '#') { // comment runs to end of line, spec-mandated
            while (i < blob.length && blob(i) != '\n') i += 1
          } else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        if (i >= blob.length || blob(i) < '0' || blob(i) > '9')
          fail(s"expected ASCII integer at offset $i")
        var v = 0
        while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
          v = v * 10 + (blob(i) - '0')
          if (v > (1 << 20)) fail("dimension overflow")
          i += 1
        }
        v
      }
      val w = int(); val h = int(); val maxval = int()
      if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
      if (maxval != 255) fail(s"unsupported maxval $maxval (8-bit only)")
      // exactly ONE whitespace byte separates header and raster (netpbm)
      if (i >= blob.length ||
          !(blob(i) == '\n' || blob(i) == ' ' || blob(i) == '\r' || blob(i) == '\t'))
        fail("missing raster separator")
      i += 1
      // Long arithmetic: w and h individually pass the 2^20 guard, so
      // w*h*3 in Int can wrap (3*2^40 ≡ 0 mod 2^32) and a header-only
      // adversarial blob would slip the check
      if ((blob.length - i).toLong != w.toLong * h * 3L)
        fail(s"raster length ${blob.length - i} != ${w.toLong * h * 3L}")
      (w, h, i)
    }

    /** Decode metadata: dimensions from the header, checksum from the one
      * pixel walk (sum of raster bytes mod 2^16). */
    def decode(blob: Array[Byte]): (Int, Int, Long) = {
      val (w, h, off) = parseHeader(blob)
      var sum = 0L
      var i = off
      while (i < blob.length) { sum += blob(i) & 0xFF; i += 1 }
      (w, h, sum % 65536)
    }

    /** The decoded raster — pixel bytes after the validated header. */
    def pixels(blob: Array[Byte]): Array[Byte] = {
      val (_, _, off) = parseHeader(blob)
      java.util.Arrays.copyOfRange(blob, off, blob.length)
    }
  }

  /** Build the blob table: each document's text deterministically ENCODED
    * as a real binary P6 container — header `P6\n{w} {h}\n255\n` + raster.
    * Dimensions derive from the text (w = 8 + first byte mod 8, h = 8 +
    * length mod 8) and the raster is the text bytes repeated cyclically to
    * w*h*3 — all integer column math, so the SQL oracle reconstructs the
    * identical container and every downstream decode is verifiable.
    * Empty text encodes as a single space (a 1-byte cycle), keeping every
    * container well-formed. ASCII corpus => char == byte throughout. */
  def blobTable(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        when(length(col("text")) > 0, col("text")).otherwise(lit(" ")).as("s"))
      .withColumn("n", length(col("s")))
      .withColumn("w", lit(8) + pmod(ascii(substring(col("s"), 1, 1)), lit(8)))
      .withColumn("h", lit(8) + pmod(col("n"), lit(8)))
      .withColumn("plen", col("w") * col("h") * lit(3))
      .withColumn("payload",
        expr("substring(repeat(s, CAST((plen + n - 1) div n AS INT)), 1, plen)"))
      .select(col("doc_id"), lit("image/ppm").as("media_type"),
        concat(lit("P6\n"), col("w").cast("string"), lit(" "),
          col("h").cast("string"), lit("\n255\n"), col("payload"))
          .cast("binary").as("blob"))

  /** Decode metadata with a per-partition batch loop (the shape a
    * vectorized/JNI decoder needs: one codec instance per partition, rows
    * streamed through it). The decode is REAL — header parse + pixel walk
    * over the container bytes ([[PpmCodec]]). */
  def decodeMeta(blobs: DataFrame): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      // per-partition setup would initialize a native codec once here
      it.map { b =>
        val (w, h, sum) = PpmCodec.decode(b.blob)
        MediaMeta(b.doc_id, b.blob.length, w, h, sum)
      }
    }
  }

  /** Decode rasters — the boundary every pixel-space operator shares:
    * header parse + raster slice per blob, batched per partition. */
  def decodePixels(blobs: DataFrame): Dataset[MediaPixels] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      it.map(b => MediaPixels(b.doc_id, PpmCodec.pixels(b.blob)))
    }
  }

  /** 32-bit perceptual difference hash (dHash) of a raster: the sign of
    * the brightness gradient between 33 evenly-sampled pixel bytes.
    * Kernel: [[graft.functions.DHash32]]. */
  def dHash32(bytes: Array[Byte]): Long = graft.functions.DHash32.compute(bytes)

  /** Per-blob perceptual hashes over the DECODED raster: the codec runs in
    * mapPartitions ([[decodePixels]] — the typed boundary a real decoder
    * needs), and the hash itself stays a native codegen'd expression
    * (graft.functions.DHash32, SQL-callable as `dhash32(pixels)`) applied
    * to the pixel bytes. Output: (doc_id, phash). */
  def perceptualHash(blobs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    decodePixels(blobs).toDF().select(col("doc_id"),
      ColumnBridge.column(graft.functions.DHash32(
        ColumnBridge.expression(col("pixels")))).as("phash"))
  }

  /** Media near-duplicate pairs with Hamming distance <= maxHamming over
    * the perceptual hash — image dedup with the same banded self-join as
    * text SimHash (graft.dedup.Dedup.simhashPairs): two 32-bit hashes at
    * distance <= 3 agree on >= 1 of 4 8-bit bands (pigeonhole), so only
    * band-equal buckets are probed. Output: (doc_id_a, doc_id_b, hamming). */
  def nearDupMedia(blobs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x8-bit banding is complete only for Hamming distance <= 3; " +
        s"maxHamming=$maxHamming would silently miss pairs — add bands instead")
    val sigs = perceptualHash(blobs)
    val banded = sigs.select(col("doc_id"), col("phash"), posexplode(
      array((0 until 4).map(b =>
        shiftrightunsigned(col("phash"), b * 8).bitwiseAND(lit(0xFFL))): _*))
      .as(Seq("band", "bucket")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Media duplicate CLUSTERS: connected components over the banded
    * perceptual-hash near-dup pairs — the media-side twin of
    * [[graft.dedup.Dedup.duplicateClusters]], sharing its min-label
    * iteration (localCheckpoint per round, driver moves only the
    * changed-count). keep marks each cluster's min-id representative;
    * dropping !keep dedups the media corpus at the perceptual level.
    * Output: (doc_id, cluster_id, keep). */
  def mediaClusters(blobs: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.dedup.Dedup.connectedComponents(
        blobs.select("doc_id"),
        nearDupMedia(blobs, maxHamming).select("doc_id_a", "doc_id_b"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))

  /** Resize planning over decoded metadata: aspect-preserving fit of
    * (width, height) into a maxDim box, downscale only (scale capped at 1).
    * Pure integer column math — the actual pixel resample would live in the
    * codec; a pipeline uses this to size decode buffers and route oversized
    * media. Output: (doc_id, width, height, out_w, out_h). */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int = 12): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(side: Column): Column =
      when(longSide <= maxDim, side)
        .otherwise(greatest(lit(1), floor(side * maxDim / longSide).cast("int")))
    meta.toDF().select(col("doc_id"), col("width"), col("height"),
      fit(col("width")).as("out_w"), fit(col("height")).as("out_h"))
  }

  /** Feature extraction: a `buckets`-bin byte histogram per DECODED raster,
    * computed in the same per-partition batch loop a real embedding/feature
    * model would use (one model instance per partition, rows streamed
    * through it), exploded to (doc_id, bucket, n_bytes) rows so the result
    * is exactly oracle-checkable. */
  def extractFeatures(blobs: DataFrame, buckets: Int = 16): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      // per-partition setup would load the feature model once here
      it.flatMap { b =>
        val px = PpmCodec.pixels(b.blob)
        val h = new Array[Long](buckets)
        var i = 0
        while (i < px.length) { h((px(i) & 0xFF) % buckets) += 1; i += 1 }
        (0 until buckets).iterator.map(k => MediaFeatures(b.doc_id, k, h(k)))
      }
    }
  }

  /** Frame sampling over the DECODED raster: one row per 128-byte pixel
    * frame with the frame's leading byte as its feature. The codec decodes
    * in mapPartitions; the fan-out (explode) and frame arithmetic stay
    * declarative column math on the raster. Output:
    * (doc_id, frame_idx, frame_off, frame_byte). */
  def sampleFrames(blobs: DataFrame, frameSize: Int = 128): DataFrame =
    decodePixels(blobs).toDF()
      .select(col("doc_id"), col("pixels"),
        // a valid raster is never empty (w,h >= 1), but keep the guard:
        // sequence(0, -1) would yield a DESCENDING [0, -1], not []
        explode(when(length(col("pixels")) > 0,
          sequence(lit(0),
            floor((length(col("pixels")) - 1) / lit(frameSize)).cast("int")))
          .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameSize).as("frame_off"),
        // 1-based substr; frame feature = first byte of the frame
        ascii(col("pixels").cast("string")
          .substr(col("frame_idx") * frameSize + 1, lit(1))).as("frame_byte"))
}
