package graft.core

import scala.util.hashing.MurmurHash3

/** Plain Bloom filter over string keys with exportable bit array.
  *
  * The reference relies on a modified Guava exposing
  * `exportBits()/wrap()/intersect()/putAll()` plus a counting ("spectral")
  * variant (reference README.md:22-26; used e.g. in
  * candidate_merging/IntersectHalfApproximateCindCandidates.scala:40-46).
  * Exact hash/FPP parity is not required — only set semantics (no false
  * negatives; bitwise union ≈ set union; bitwise intersection over-approximates
  * set intersection), so this is a fresh implementation: double hashing from
  * two MurmurHash3 seeds, bits stored as Array[Long] so the filter is directly
  * Spark-serializable and mergeable in aggregators.
  */
final class BloomFilter(val numBits: Int, val numHashes: Int, val bits: Array[Long])
    extends Serializable {

  def put(key: String): Unit =
    putHashes(MurmurHash3.stringHash(key, 0x9747b28c),
      MurmurHash3.stringHash(key, 0x5bd1e995))

  /** Long-key insert — fmix64 double hashing, NO per-key String allocation
    * (the packed-long pair-key stream is the most voluminous relation in
    * the CIND job; stringifying every key there costs an allocation + a
    * char-wise hash per key). String and long key spaces are independent:
    * a filter must be built and queried with the SAME key type. */
  def put(key: Long): Unit =
    putHashes(Bloom.longHash1(key), Bloom.longHash2(key))

  private def putHashes(h1: Int, h2: Int): Unit = {
    var i = 0
    while (i < numHashes) {
      val idx = Bloom.index(h1, h2, i, numBits)
      bits(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  def mightContain(key: String): Boolean =
    containsHashes(MurmurHash3.stringHash(key, 0x9747b28c),
      MurmurHash3.stringHash(key, 0x5bd1e995))

  def mightContain(key: Long): Boolean =
    containsHashes(Bloom.longHash1(key), Bloom.longHash2(key))

  private def containsHashes(h1: Int, h2: Int): Boolean = {
    var i = 0
    while (i < numHashes) {
      val idx = Bloom.index(h1, h2, i, numBits)
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise union — equivalent to having inserted both key sets. */
  def mergeInPlace(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  /** Bitwise intersection — over-approximates the key-set intersection
    * (never drops a key present in both; may keep extras). */
  def intersectInPlace(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < bits.length) { bits(i) &= other.bits(i); i += 1 }
    this
  }

  def exportBits: Array[Long] = bits.clone()

  def copy: BloomFilter = new BloomFilter(numBits, numHashes, bits.clone())
}

object Bloom {
  @inline private[core] def index(h1: Int, h2: Int, i: Int, numBits: Int): Int = {
    val combined = (h1.toLong + i.toLong * h2.toLong) & Long.MaxValue
    (combined % numBits).toInt
  }

  /** Murmur3 64-bit finalizer — full avalanche, so the two seeded variants
    * below behave as independent hash functions for double hashing. */
  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private[core] def longHash1(key: Long): Int =
    fmix64(key ^ 0x9747b28cL).toInt

  @inline private[core] def longHash2(key: Long): Int =
    (fmix64(key ^ 0x5bd1e995L) >>> 32).toInt

  /** Standard sizing: m = -n ln p / (ln 2)^2, k = m/n ln 2. */
  def create(expectedInsertions: Long, fpp: Double): BloomFilter = {
    val n = math.max(1L, expectedInsertions)
    val m0 = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val m = math.min(m0, Int.MaxValue.toLong - 64).toInt.max(64)
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    new BloomFilter(m, k, new Array[Long]((m + 63) >>> 6))
  }

  def wrap(numBits: Int, numHashes: Int, bits: Array[Long]): BloomFilter =
    new BloomFilter(numBits, numHashes, bits)
}

/** Counting ("spectral") Bloom filter: fixed-width saturating counters, min
  * over hash cells as the count estimate (never under-counts). Mirrors the
  * reference's spectral filter role (util/BloomFilterParameters.scala:33-34,
  * used by the half-approximate overlap merges) without its bit layout.
  */
final class SpectralBloomFilter(
    val numCells: Int,
    val bitsPerCell: Int,
    val numHashes: Int,
    val cells: Array[Long]) extends Serializable {

  private val maxCount: Long = (1L << bitsPerCell) - 1

  private def getCell(idx: Int): Long = {
    val bitPos = idx.toLong * bitsPerCell
    val word = (bitPos >>> 6).toInt
    val off = (bitPos & 63).toInt
    if (off + bitsPerCell <= 64) (cells(word) >>> off) & maxCount
    else {
      val lo = cells(word) >>> off
      val hi = cells(word + 1) << (64 - off)
      (lo | hi) & maxCount
    }
  }

  private def setCell(idx: Int, value: Long): Unit = {
    val v = math.min(value, maxCount)
    val bitPos = idx.toLong * bitsPerCell
    val word = (bitPos >>> 6).toInt
    val off = (bitPos & 63).toInt
    if (off + bitsPerCell <= 64) {
      cells(word) = (cells(word) & ~(maxCount << off)) | (v << off)
    } else {
      val loBits = 64 - off
      cells(word) = (cells(word) & ~(maxCount << off)) | (v << off)
      val hiMask = maxCount >>> loBits
      cells(word + 1) = (cells(word + 1) & ~hiMask) | (v >>> loBits)
    }
  }

  def add(key: String, delta: Long = 1L): Unit =
    addHashes(MurmurHash3.stringHash(key, 0x9747b28c),
      MurmurHash3.stringHash(key, 0x5bd1e995), delta)

  /** Long-key insert (see [[BloomFilter.put(key:Long)*]]): same cell
    * indexing as the plain filter, so a spectral sketch built with long
    * keys collapses ([[toBloomFilter]]) to a filter queryable with the
    * SAME long keys. */
  def add(key: Long, delta: Long): Unit =
    addHashes(Bloom.longHash1(key), Bloom.longHash2(key), delta)

  def add(key: Long): Unit = add(key, 1L)

  private def addHashes(h1: Int, h2: Int, delta: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val idx = Bloom.index(h1, h2, i, numCells)
      setCell(idx, getCell(idx) + delta)
      i += 1
    }
  }

  /** Upper bound of the key's insert count (min over its cells). */
  def count(key: String): Long =
    countHashes(MurmurHash3.stringHash(key, 0x9747b28c),
      MurmurHash3.stringHash(key, 0x5bd1e995))

  def count(key: Long): Long =
    countHashes(Bloom.longHash1(key), Bloom.longHash2(key))

  private def countHashes(h1: Int, h2: Int): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < numHashes) {
      val idx = Bloom.index(h1, h2, i, numCells)
      val c = getCell(idx)
      if (c < min) min = c
      i += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  /** Cell-wise saturating sum — equivalent to adding both key bags. */
  def mergeInPlace(other: SpectralBloomFilter): SpectralBloomFilter = {
    require(other.numCells == numCells && other.bitsPerCell == bitsPerCell &&
      other.numHashes == numHashes)
    var i = 0
    while (i < numCells) { setCell(i, getCell(i) + other.getCell(i)); i += 1 }
    this
  }

  /** Collapse to a membership filter of keys with count >= minCount. */
  def toBloomFilter(minCount: Long): BloomFilter = {
    val bf = new BloomFilter(numCells, numHashes, new Array[Long]((numCells + 63) >>> 6))
    var i = 0
    while (i < numCells) {
      if (getCell(i) >= minCount) bf.bits(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    bf
  }
}

object SpectralBloomFilter {
  /** bitsPerCell follows the reference's rule 33 - nlz(minSupport)
    * (plan/SmallToLargeTraversalStrategy.scala:181-193): enough width to
    * count just past the support threshold. */
  def create(expectedInsertions: Long, fpp: Double, minSupport: Int): SpectralBloomFilter = {
    val proto = Bloom.create(expectedInsertions, fpp)
    val bitsPerCell = math.min(32, 33 - Integer.numberOfLeadingZeros(math.max(1, minSupport)))
    val numCells = proto.numBits
    val words = ((numCells.toLong * bitsPerCell + 63) >>> 6).toInt
    new SpectralBloomFilter(numCells, bitsPerCell, proto.numHashes, new Array[Long](words))
  }
}
