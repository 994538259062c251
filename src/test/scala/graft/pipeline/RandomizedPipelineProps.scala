package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative checks for the round-8 pipeline operators: on random tiny
  * corpora (small vocabulary => dense chunk/window collisions, repeated
  * words, single-token and boundary-length documents), each distributed
  * operator must equal its sequential first-principles oracle. The hand
  * fixtures pin the advertised behaviors; these sweep the edges. */
object RandomizedPipelineProps extends Properties("graft.pipeline.props") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val word = Gen.oneOf("aa", "ab", "ba", "b", "ccc")
  private val text = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(1, 10).flatMap(n =>
    Gen.listOfN(n, text)).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("paragraphDedup == sequential first-occurrence replay") =
    forAll(corpus, Gen.chooseNum(1, 4)) { (docs, span) =>
      import spark.implicits._
      val seen = scala.collection.mutable.HashSet[String]()
      val expected = docs.sortBy(_._1).map { case (id, t) =>
        val chunks = t.split(" ", -1).grouped(span).map(_.mkString(" ")).toSeq
        val kept = chunks.filter(seen.add)
        id -> ((chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = graft.dedup.Dedup.paragraphDedup(docs.toDF("doc_id", "text"), span)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      got == expected
    }

  property("crossSourceOverlap == brute-force distinct shared-window pairs") =
    forAll(corpus, Gen.chooseNum(2, 3)) { (docs, n) =>
      import spark.implicits._
      val srcd = docs.map { case (id, t) => (id, t, s"s${id % 3}") }
      val bySrc = srcd.groupBy(_._3).map { case (src, ds) =>
        src -> ds.flatMap(d => d._2.split(" ", -1).sliding(n)
          .filter(_.length == n).map(_.mkString(" "))).toSet
      }
      val expected = (for {
        (sa, wa) <- bySrc; (sb, wb) <- bySrc if sa < sb
        shared = (wa & wb).size if shared > 0
      } yield (sa, sb) -> shared.toLong).toMap
      val got = graft.dedup.Dedup.crossSourceOverlap(
          srcd.toDF("doc_id", "text", "source"), n)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      got == expected
    }

  property("bpeTrain == sequential reference trainer") =
    forAll(corpus, Gen.chooseNum(1, 3)) { (docs, k) =>
      import spark.implicits._
      val words = docs.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      var vocab: Map[Vector[String], Long] =
        words.groupMapReduce { case (w, _) => w.split("").toVector }(_._2)(_ + _)
      val expected = scala.collection.mutable.ListBuffer[(Int, String, Long)]()
      var stop = false
      for (i <- 1 to k if !stop) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case Seq(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + f
            case _ => ()
          }
        }
        if (counts.isEmpty) stop = true
        else {
          val ((x, y), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          expected += ((i, s"$x $y", cnt))
          vocab = vocab.groupMapReduce { case (syms, _) =>
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == x && syms(j + 1) == y) {
                out += x + y; j += 2
              } else { out += syms(j); j += 1 }
            }
            out.result()
          }(_._2)(_ + _)
        }
      }
      val got = graft.text.TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), k)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      got == expected.toSeq
    }

  property("shardAssign: monotone, in-range, token-balanced within one document") =
    forAll(corpus, Gen.chooseNum(1, 5)) { (docs, shards) =>
      import spark.implicits._
      val rows = graft.pipeline.Curation.shardAssign(docs.toDF("doc_id", "text"), shards)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      val total = rows.map(_._2).sum
      val maxDoc = rows.map(_._2).max
      val perShard = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
      rows.forall(r => r._3 >= 0 && r._3 < shards) &&
        rows.sliding(2).forall {
          case Array(a, b) => a._3 <= b._3
          case _ => true
        } &&
        // each shard's load is within one document of the ideal cut
        perShard.values.forall(_ <= total / shards + maxDoc)
    }
}
