package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media blob with typed metadata. */
final case class MediaBlob(doc_id: Long, media_type: String, blob: Array[Byte])

/** Decoded (stub) media metadata. */
final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
    checksum: Long)

/** One bucket of a blob's byte histogram (stub feature vector, exploded to
  * scalar rows so the oracle can hash-compare it). */
final case class MediaFeatures(doc_id: Long, bucket: Int, n_bytes: Long)

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, decode / frame-sample as mapPartitions over typed Datasets.
  *
  * The decode kernel is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); everything around it — schema, encoders,
  * partition-batched iteration, fan-out of frames — is the real Spark-side
  * plumbing a decoder would plug into: swap [[FakeCodec.decode]] for a
  * JNI/libjpeg call and nothing else changes.
  */
object Multimodal {

  /** STUB codec: derives metadata deterministically from bytes so oracles
    * can verify the pipeline end-to-end. */
  object FakeCodec {
    def decode(blob: Array[Byte]): (Int, Int, Long) = {
      // ??? real decoder goes here; deterministic fake below
      val w = 64 + (if (blob.length > 0) (blob(0) & 0xFF) % 64 else 0)
      val h = 64 + (if (blob.length > 1) (blob(1) & 0xFF) % 64 else 0)
      var sum = 0L
      var i = 0
      while (i < blob.length) { sum += (blob(i) & 0xFF); i += 1 }
      (w, h, sum % 65536)
    }
  }

  /** Build the blob table from documents: text bytes stand in for encoded
    * media (binary column + media type tag). */
  def blobTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      col("text").cast("binary").as("blob"))

  /** Decode metadata with a per-partition batch loop (the shape a
    * vectorized/JNI decoder needs: one codec instance per partition, rows
    * streamed through it). */
  def decodeMeta(blobs: DataFrame): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      // per-partition setup would initialize the codec once here
      it.map { b =>
        val (w, h, sum) = FakeCodec.decode(b.blob)
        MediaMeta(b.doc_id, b.blob.length, w, h, sum)
      }
    }
  }

  /** 32-bit perceptual difference hash (dHash) of a blob: the sign of the
    * "brightness" gradient between 33 evenly-sampled positions — here the
    * raw bytes stand in for the decoded pixel row a real codec would
    * yield (swap the byte reads for pixel luminance and nothing else
    * changes). Stable under in-place byte edits (sampling positions
    * depend only on length); length changes shift every sample — the
    * standard dHash tradeoff. Kernel: [[graft.functions.DHash32]]. */
  def dHash32(bytes: Array[Byte]): Long = graft.functions.DHash32.compute(bytes)

  /** Per-blob perceptual hashes via the NATIVE codegen'd expression
    * (graft.functions.DHash32, also SQL-callable as `dhash32(blob)`):
    * pure byte math stays inside whole-stage codegen — no typed
    * mapPartitions boundary around the scan. A real pipeline decodes in
    * mapPartitions first (see [[decodeMeta]]) and applies the same
    * expression to the decoded pixels. Output: (doc_id, phash). */
  def perceptualHash(blobs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    blobs.select(col("doc_id"),
      ColumnBridge.column(graft.functions.DHash32(
        ColumnBridge.expression(col("blob")))).as("phash"))
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
    * codec (stub here); a pipeline uses this to size decode buffers and
    * route oversized media. Output: (doc_id, width, height, out_w, out_h). */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Int = 64): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(side: Column): Column =
      when(longSide <= maxDim, side)
        .otherwise(greatest(lit(1), floor(side * maxDim / longSide).cast("int")))
    meta.toDF().select(col("doc_id"), col("width"), col("height"),
      fit(col("width")).as("out_w"), fit(col("height")).as("out_h"))
  }

  /** Stub feature extraction: a `buckets`-bin byte histogram per blob,
    * computed in the same per-partition batch loop a real embedding/feature
    * model would use (one model instance per partition, rows streamed
    * through it), exploded to (doc_id, bucket, n_bytes) rows so the result
    * is exactly oracle-checkable. */
  def extractFeatures(blobs: DataFrame, buckets: Int = 16): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      // per-partition setup would load the feature model once here
      it.flatMap { b =>
        val h = new Array[Long](buckets)
        var i = 0
        while (i < b.blob.length) { h((b.blob(i) & 0xFF) % buckets) += 1; i += 1 }
        (0 until buckets).iterator.map(k => MediaFeatures(b.doc_id, k, h(k)))
      }
    }
  }

  /** Frame sampling: one row per 128-byte frame of each blob with the
    * frame's leading byte as its (stub) feature. Demonstrates media fan-out
    * (explode) with deterministic, oracle-checkable output:
    * (doc_id, frame_idx, frame_off, frame_byte). */
  def sampleFrames(blobs: DataFrame, frameSize: Int = 128): DataFrame =
    blobs
      .select(col("doc_id"), col("blob"),
        // empty-blob guard: sequence(0, -1) yields a DESCENDING [0, -1], not
        // an empty array — an empty blob must produce zero frames
        explode(when(length(col("blob")) > 0,
          sequence(lit(0),
            floor((length(col("blob")) - 1) / lit(frameSize)).cast("int")))
          .otherwise(array().cast("array<int>")))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameSize).as("frame_off"),
        // 1-based substr; frame feature = first byte of the frame
        ascii(col("blob").cast("string")
          .substr(col("frame_idx") * frameSize + 1, lit(1))).as("frame_byte"))
}
