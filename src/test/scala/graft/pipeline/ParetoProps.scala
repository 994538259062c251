package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the bucketed-staircase skyline: on random tiny
  * corpora (heavy (x, y) ties, twins, repeated tokens, length-1 docs),
  * paretoDocs at several bucket widths must equal the brute-force
  * NOT-EXISTS dominance set computed sequentially. */
object ParetoProps extends Properties("graft.pipeline.pareto") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  // texts over a 3-token alphabet, lengths 1..8 — dense tie structure
  private val docsGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 14)
    txts <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
  } yield txts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def xy(text: String): (Long, Long) = {
    val toks = text.split(" ", -1)
    val x = toks.length.toLong
    (x, toks.distinct.length.toLong * 1000000L / x)
  }

  property("paretoDocs == brute-force dominance at every bucket width") =
    forAll(docsGen, Gen.oneOf(1L, 2L, 5L, 100L)) { (docs, w) =>
      import spark.implicits._
      val pts = docs.map { case (id, t) => (id, xy(t)) }
      val brute = pts.filter { case (_, (x, y)) =>
        !pts.exists { case (_, (x2, y2)) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }.map(_._1).toSet
      val got = Curation.paretoDocs(docs.toDF("doc_id", "text"), w)
        .collect().map(_.getLong(0)).toSet
      got == brute
    }
}
