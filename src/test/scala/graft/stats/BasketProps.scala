package graft.stats

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the market-basket miner: on random small baskets
  * (dense key collisions, duplicate lines, single-part orders, the empty
  * relation), the collapsed-basket index-pair fan-out must return EXACTLY
  * the brute-force "distinct (order, part) self-join" co-occurrence
  * counts, and every rule's confidence must equal the integer floor
  * division of its pair support by its antecedent's order count. */
object BasketProps extends Properties("graft.stats.basket") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  // small key spaces force shared parts across orders AND duplicate
  // lineitems within an order (the distinct-collapse path)
  private val lines: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      o <- Gen.chooseNum(1L, 8L)
      p <- Gen.chooseNum(100L, 107L)
    } yield (o, p))
  } yield rows

  private def brute(rows: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val baskets = rows.distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted).toMap
    baskets.values.toSeq
      .flatMap(ps => for {
        i <- ps.indices; j <- (i + 1) until ps.size
      } yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  property("basketPairs == brute-force co-occurrence at every support") =
    forAll(lines) { rows =>
      import spark.implicits._
      val df = rows.toDF("l_orderkey", "l_partkey")
      val got = Analytics.basketPairs(df, 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got == brute(rows)
    }

  property("basketRules: conf_e6 is the exact floor division") =
    forAll(lines) { rows =>
      import spark.implicits._
      val df = rows.toDF("l_orderkey", "l_partkey")
      val itemSup = rows.distinct.groupBy(_._2)
        .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
      val pairSup = brute(rows)
      val got = Analytics.basketRules(df, 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val want = pairSup.flatMap { case ((a, b), s) =>
        Seq((a, b) -> ((s, itemSup(a), s * 1000000L / itemSup(a))),
          (b, a) -> ((s, itemSup(b), s * 1000000L / itemSup(b))))
      }
      got == want
    }
}
