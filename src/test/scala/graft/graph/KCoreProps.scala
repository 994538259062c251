package graft.graph

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the bounded k-core peel: on random small graphs
  * (dense key collisions, multi-edges collapsing, stars, chains), R
  * synchronous Spark rounds must equal a sequential reference peeling the
  * same R rounds — and once the reference reaches its fixpoint within R,
  * the result IS the true k-core. */
object KCoreProps extends Properties("graft.graph.kcore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val edgeGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 30)
    rows <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(1L, 10L)
      b <- Gen.chooseNum(1L, 10L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield rows.distinct

  /** Sequential reference: R synchronous rounds of drop-below-k. */
  private def refPeel(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var e = edges
    for (_ <- 1 to rounds) {
      val deg = e.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  property("kCore == sequential R-round peel; fixpoint == true core") =
    forAll(edgeGen, Gen.chooseNum(1, 4)) { (edges, k) =>
      import spark.implicits._
      val df = edges.toDF("a", "b")
      val got = Graph.kCore(df, k, 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = refPeel(edges, k, 4)
      // with <= 10 nodes, 4 rounds always reach fixpoint: one more
      // sequential round must be a no-op, so `want` is the true k-core
      val fix = refPeel(edges, k, 5)
      got == want && want == fix
    }
}
