package graft.core

import scala.reflect.ClassTag

/** Two-pointer merge operations over sorted, duplicate-free arrays — the
  * buffer algebra behind the set-intersection / set-union aggregates
  * (reference rdfind-util/.../CollectionUtils.java:118-225 semantics).
  * All inputs and outputs are sorted ascending and duplicate-free.
  */
object SortedOps {

  /** Intersection of two sorted arrays. */
  def intersect[T: ClassTag](a: Array[T], b: Array[T])(implicit ord: Ordering[T]): Array[T] = {
    val out = Array.newBuilder[T]
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val c = ord.compare(a(i), b(j))
      if (c == 0) { out += a(i); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    out.result()
  }

  /** Union of two sorted arrays. */
  def union[T: ClassTag](a: Array[T], b: Array[T])(implicit ord: Ordering[T]): Array[T] = {
    val out = Array.newBuilder[T]
    out.sizeHint(a.length max b.length)
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val c = ord.compare(a(i), b(j))
      if (c == 0) { out += a(i); i += 1; j += 1 }
      else if (c < 0) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out.result()
  }

  /** Union of two sorted (key -> count) sequences, summing counts of equal
    * keys — the overlap-counting merge (reference
    * candidate_merging/MultiunionOverlapCandidates.scala:14-50 semantics). */
  def unionSumCounts[T: ClassTag](
      a: Array[T], ac: Array[Long],
      b: Array[T], bc: Array[Long])(implicit ord: Ordering[T]): (Array[T], Array[Long]) = {
    val keys = Array.newBuilder[T]
    val counts = Array.newBuilder[Long]
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val c = ord.compare(a(i), b(j))
      if (c == 0) { keys += a(i); counts += ac(i) + bc(j); i += 1; j += 1 }
      else if (c < 0) { keys += a(i); counts += ac(i); i += 1 }
      else { keys += b(j); counts += bc(j); j += 1 }
    }
    while (i < a.length) { keys += a(i); counts += ac(i); i += 1 }
    while (j < b.length) { keys += b(j); counts += bc(j); j += 1 }
    (keys.result(), counts.result())
  }

  /** Size of the intersection without materializing it. */
  def intersectionSize[T](a: Array[T], b: Array[T])(implicit ord: Ordering[T]): Int = {
    var i = 0
    var j = 0
    var n = 0
    while (i < a.length && j < b.length) {
      val c = ord.compare(a(i), b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  def isSorted[T](a: Array[T])(implicit ord: Ordering[T]): Boolean = {
    var i = 1
    while (i < a.length) {
      if (ord.compare(a(i - 1), a(i)) >= 0) return false
      i += 1
    }
    true
  }

  // ------------------------------------------------------------------
  // Delta+varint packing of sorted non-negative long arrays (r13): the
  // hybrid CIND aggregation buffers carry their intersected ref-id sets
  // through the evidence exchange — the measured max stage of every CIND
  // strategy at sf5/sf10 (23.8/18.6 GB, BASELINE.md r12). Dictionary ids
  // are dense by construction, so sorted ref sets have small deltas:
  // LEB128(first value, then successive deltas) packs ~8 bytes/id down to
  // ~1-2. Exact and lossless; all operands sorted ascending, dup-free.
  // ------------------------------------------------------------------

  /** Pack a sorted non-negative long array as LEB128 first-value + deltas. */
  def packDeltas(a: Array[Long]): Array[Byte] = {
    if (a.isEmpty) return Array.emptyByteArray
    // worst case 10 bytes per value
    val out = new Array[Byte](a.length * 10)
    var k = 0
    var prev = 0L
    var i = 0
    while (i < a.length) {
      var v = if (i == 0) a(0) else a(i) - prev
      prev = a(i)
      while ((v & ~0x7FL) != 0L) { out(k) = ((v & 0x7F) | 0x80).toByte; k += 1; v >>>= 7 }
      out(k) = v.toByte; k += 1
      i += 1
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Inverse of [[packDeltas]]. */
  def unpackDeltas(p: Array[Byte]): Array[Long] = {
    if (p.isEmpty) return Array.emptyLongArray
    val out = Array.newBuilder[Long]
    var i = 0
    var prev = 0L
    var first = true
    while (i < p.length) {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        b = p(i); i += 1
        v |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      prev = if (first) v else prev + v
      first = false
      out += prev
    }
    out.result()
  }

  /** Intersection of two packed sorted sets, streaming — never unpacks a
    * whole operand. The hot merge kernel of the hybrid buffers. */
  def intersectPacked(pa: Array[Byte], pb: Array[Byte]): Array[Byte] = {
    if (pa.isEmpty || pb.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte](math.min(pa.length, pb.length))
    var k = 0
    var ia = 0; var va = 0L; var firstA = true
    var ib = 0; var vb = 0L; var firstB = true
    var prevOut = 0L
    var firstOut = true
    def next(p: Array[Byte], i0: Int): (Long, Int) = {
      var v = 0L; var shift = 0; var i = i0; var b = 0
      do { b = p(i); i += 1; v |= (b & 0x7FL) << shift; shift += 7 } while ((b & 0x80) != 0)
      (v, i)
    }
    // prime both cursors
    var t = next(pa, ia); va = t._1; ia = t._2; firstA = false
    t = next(pb, ib); vb = t._1; ib = t._2; firstB = false
    var doneA = false; var doneB = false
    while (!doneA && !doneB) {
      if (va == vb) {
        var d = if (firstOut) va else va - prevOut
        prevOut = va; firstOut = false
        while ((d & ~0x7FL) != 0L) { out(k) = ((d & 0x7F) | 0x80).toByte; k += 1; d >>>= 7 }
        out(k) = d.toByte; k += 1
        if (ia < pa.length) { t = next(pa, ia); va += t._1; ia = t._2 } else doneA = true
        if (ib < pb.length) { t = next(pb, ib); vb += t._1; ib = t._2 } else doneB = true
      } else if (va < vb) {
        if (ia < pa.length) { t = next(pa, ia); va += t._1; ia = t._2 } else doneA = true
      } else {
        if (ib < pb.length) { t = next(pb, ib); vb += t._1; ib = t._2 } else doneB = true
      }
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Intersection of a packed sorted set with a plain sorted array,
    * emitting packed — the hybrid reduce-side kernel (evidence refs arrive
    * as plain arrays; only buffers pack). */
  def intersectPackedSorted(pa: Array[Byte], b: Array[Long]): Array[Byte] =
    packDeltas(intersect(unpackDeltas(pa), b))
}
