package graft.streaming

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized as-of join check: the Spark union-tag + window plan must
  * agree with a direct per-row reference ("for each left row, the best
  * (ts desc, id asc... actually max ts) right row with ts <= left.ts")
  * across duplicate left timestamps, exact ties, sparse keys, and keys
  * with no right rows at all. Deterministic seeds — failures reproduce. */
class AsOfJoinPropertySpec extends SparkSpec {

  private val genRows: Gen[(List[(Long, Long, Long)], List[(Long, Long, Double)])] = for {
    nL <- Gen.choose(0, 60)
    nR <- Gen.choose(0, 40)
    left <- Gen.listOfN(nL, for {
      k <- Gen.choose(1L, 6L); t <- Gen.choose(0L, 30L)
    } yield (k, t))
    right <- Gen.listOfN(nR, for {
      k <- Gen.choose(1L, 6L); t <- Gen.choose(0L, 30L)
    } yield (k, t))
  } yield (
    left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // unique (key, ts) on the right — the operator's contract
    right.distinct.map { case (k, t) => (k, t, (k * 100 + t).toDouble) })

  test("asOfJoin agrees with the per-row reference on 100 random instances") {
    import spark.implicits._
    val params = Gen.Parameters.default
    for (caseNo <- 0 until 100) {
      val (l, r) = genRows(params, Seed(caseNo.toLong)).get
      val left = l.toDF("event_id", "user_id", "ts")
      val right = r.toDF("user_id", "ts", "v")
      val got = EventStream.asOfJoin(left, right, "user_id", "ts", Seq("ts", "v"))
        .collect()
        .map(x => x.getLong(0) ->
          (Option(x.get(3)).map(_.asInstanceOf[Long]),
           Option(x.get(4)).map(_.asInstanceOf[Double])))
        .toMap
      val want = l.map { case (id, k, t) =>
        val cands = r.filter(x => x._1 == k && x._2 <= t)
        val best = if (cands.isEmpty) (None, None)
          else { val b = cands.maxBy(_._2); (Some(b._2), Some(b._3)) }
        id -> best
      }.toMap
      assert(got == want, s"case $caseNo: left=$l right=$r")
    }
  }
}
