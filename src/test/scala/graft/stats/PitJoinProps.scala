package graft.stats

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the point-in-time SCD2 join: random
  * non-overlapping version chains (gaps before the first version, open
  * tails, single-version keys) and random facts — every fact must
  * resolve exactly the version covering its timestamp, with the matched
  * flag false and the -1 sentinel only on genuine gaps, and exactly one
  * output row per fact. */
object PitJoinProps extends Properties("graft.stats.pitjoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  /** Per key: a sorted chain of boundaries -> [b0,b1), [b1,b2), ..., last
    * open (-1); values include -1 to exercise sentinel disambiguation. */
  private val dimGen: Gen[Seq[(Long, Long, Long, Long)]] = for {
    keys <- Gen.chooseNum(1, 4)
    chains <- Gen.sequence[Seq[Seq[(Long, Long, Long, Long)]], Seq[(Long, Long, Long, Long)]](
      (1L to keys).map { k =>
        for {
          nb <- Gen.chooseNum(1, 4)
          bs <- Gen.listOfN(nb, Gen.chooseNum(0L, 900L))
          vs <- Gen.listOfN(nb, Gen.oneOf(-1L, 7L, 42L))
        } yield {
          val sorted = bs.distinct.sorted
          sorted.zipWithIndex.map { case (b, i) =>
            val to = if (i == sorted.size - 1) -1L else sorted(i + 1)
            (k, vs(i % vs.size), b, to)
          }
        }
      })
  } yield chains.flatten

  private val factsGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 5L) // key 5 never exists in the dim
      ts <- Gen.chooseNum(0L, 1000L)
    } yield (k, ts))
  } yield rows.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }

  property("pitJoin == sequential version resolution, one row per fact") =
    forAll(dimGen, factsGen) { (dim, facts) =>
      import spark.implicits._
      val dimDf = dim.toDF("k", "v", "valid_from_us", "valid_to_us")
      val factDf = facts.toDF("fact_id", "k", "ts_us")
      val got = Analytics.pitJoin(factDf, dimDf).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getLong(4))))
      val gotMap = got.toMap
      val want = facts.map { case (id, k, ts) =>
        val hit = dim.find { case (dk, _, from, to) =>
          dk == k && from <= ts && (to == -1L || ts < to)
        }
        id -> ((hit.isDefined, hit.map(_._2).getOrElse(-1L)))
      }.toMap
      got.length == facts.size && gotMap == want
    }
}
