package graft.dedup

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the FastSS edit-distance-1 linkage: on random
  * short strings over a tiny alphabet (dense near-collisions, repeated
  * characters, length-1 and equal-string edge cases), the wildcard +
  * deletion-neighborhood blocking must return EXACTLY the all-pairs
  * levenshtein==1 relation — no false positives (the verify residual),
  * no misses (blocking exactness), no duplicates (the disjoint key
  * classes). */
object LinkageProps extends Properties("graft.dedup.linkage") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  // length 0 included: empty names are FILTERED by contract (the
  // descending sequence(1,0) would otherwise duplicate the wildcard key)
  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 6)
    cs <- Gen.listOfN(n, Gen.oneOf(Seq('a', 'b', 'c')))
  } yield cs.mkString
  private val records: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 12)
    nms <- Gen.listOfN(n, nameGen)
  } yield nms.distinct.zipWithIndex.map { case (nm, i) => (i.toLong, nm) }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("editNeighborPairs == all-pairs levenshtein==1, duplicate-free") =
    forAll(records) { recs =>
      import spark.implicits._
      val got = Dedup.editNeighborPairs(recs.toDF("id", "name"), "id", "name")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      val want = (for {
        (ia, na) <- recs; (ib, nb) <- recs
        if ia < ib && na.nonEmpty && nb.nonEmpty && lev(na, nb) == 1
      } yield (ia, ib))
      got.sorted == want.sorted && got.distinct.size == got.size
    }
}
