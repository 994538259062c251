package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {

  test("no false negatives") {
    val bf = Bloom.create(1000, 0.01)
    val keys = (0 until 1000).map(i => s"key-$i")
    keys.foreach(bf.put)
    keys.foreach(k => assert(bf.mightContain(k)))
  }

  test("false positive rate is roughly as configured") {
    val bf = Bloom.create(10000, 0.01)
    (0 until 10000).foreach(i => bf.put(s"in-$i"))
    val fps = (0 until 10000).count(i => bf.mightContain(s"out-$i"))
    assert(fps < 300, s"fp count $fps")
  }

  test("merge is bitwise union of key sets") {
    val a = Bloom.create(100, 0.01)
    val b = Bloom.create(100, 0.01)
    a.put("x"); b.put("y")
    a.mergeInPlace(b)
    assert(a.mightContain("x") && a.mightContain("y"))
  }

  test("intersect never drops keys present in both") {
    val a = Bloom.create(1000, 0.01)
    val b = Bloom.create(1000, 0.01)
    (0 until 100).foreach(i => a.put(s"both-$i"))
    (0 until 100).foreach(i => b.put(s"both-$i"))
    (0 until 100).foreach(i => a.put(s"onlyA-$i"))
    (0 until 100).foreach(i => b.put(s"onlyB-$i"))
    a.intersectInPlace(b)
    (0 until 100).foreach(i => assert(a.mightContain(s"both-$i")))
  }

  test("export/wrap round-trips") {
    val a = Bloom.create(100, 0.01)
    a.put("hello")
    val b = Bloom.wrap(a.numBits, a.numHashes, a.exportBits)
    assert(b.mightContain("hello"))
  }

  test("spectral filter counts are upper bounds and exact-ish when sparse") {
    val sbf = SpectralBloomFilter.create(1000, 0.01, minSupport = 10)
    (0 until 7).foreach(_ => sbf.add("seven"))
    (0 until 12).foreach(_ => sbf.add("twelve"))
    assert(sbf.count("seven") >= 7)
    assert(sbf.count("twelve") >= 12)
    assert(sbf.count("absent") <= 1)
    val bf = sbf.toBloomFilter(10)
    assert(bf.mightContain("twelve"))
  }

  test("spectral merge sums counts") {
    val a = SpectralBloomFilter.create(100, 0.01, 10)
    val b = SpectralBloomFilter.create(100, 0.01, 10)
    (0 until 4).foreach(_ => a.add("k"))
    (0 until 5).foreach(_ => b.add("k"))
    a.mergeInPlace(b)
    assert(a.count("k") >= 9)
  }

  test("default 10M/1% sizing has numBits not divisible by 64 and still works") {
    // regression: a bit array sized nb>>>6 (round DOWN) is one word short
    // whenever numBits % 64 != 0 — hashes landing in the last partial word
    // then throw ArrayIndexOutOfBoundsException
    val proto = Bloom.create(10000000L, 0.01)
    assert(proto.numBits % 64 != 0, "sizing regression guard expects a non-multiple")
    val wrapped = Bloom.wrap(proto.numBits, proto.numHashes,
      new Array[Long]((proto.numBits + 63) >>> 6))
    (0 until 50000).foreach(i => wrapped.put(s"k-$i"))
    (0 until 50000).foreach(i => assert(wrapped.mightContain(s"k-$i")))
  }

  test("spectral counters saturate instead of overflowing") {
    val sbf = SpectralBloomFilter.create(100, 0.01, minSupport = 2)
    val max = (1L << sbf.bitsPerCell) - 1
    (0L until (max + 5)).foreach(_ => sbf.add("hot"))
    assert(sbf.count("hot") == max)
  }
}
