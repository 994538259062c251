package graft.text

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the PMI-lift collocation miner: on random tiny
  * corpora over a 3-token alphabet (dense bigram collisions, 1-token
  * docs with no bigrams), the vocabulary-relation pipeline must equal a
  * sequential reference — counts, marginals, integer lift, the
  * (lift desc, bigram asc) tie order, and the top-k cut. */
object CollocationProps extends Properties("graft.text.collocations") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val docsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 10)
    txts <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
  } yield txts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("collocations == sequential lift ranking with the exact tie order") =
    forAll(docsGen, Gen.chooseNum(1L, 3L), Gen.chooseNum(1, 8)) {
      (docs, minCount, k) =>
        import spark.implicits._
        val bgs = docs.flatMap { case (_, t) =>
          val toks = t.split(" ", -1)
          toks.zip(toks.drop(1)).map { case (x, y) => s"$x $y" }
        }
        val cnt = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val nTotal = bgs.size.toLong
        val nx = bgs.map(_.split(" ")(0)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val ny = bgs.map(_.split(" ")(1)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val want = cnt.filter(_._2 >= minCount).toSeq.map { case (bg, n) =>
          val Array(w1, w2) = bg.split(" ")
          (bg, n, nx(w1), ny(w2), n * nTotal * 10000L / (nx(w1) * ny(w2)))
        }.sortBy(r => (-r._5, r._1)).take(k)
        val got = TextAnalysis.collocations(docs.toDF("doc_id", "text"),
            minCount, k)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        got == want
    }
}
