package graft.streaming

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative check for the shared funnel anchor ladder: on random event
  * streams (repeated stages, ties at the same instant, users missing
  * stages), both the unbounded and the gap-bounded funnels must equal a
  * sequential reference of the same ladder semantics — per stage the
  * user's EARLIEST event at/after the previous anchor (and within the
  * gap), with stage-1 the plain minimum. */
object FunnelProps extends Properties("graft.streaming.funnel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val Stages = Seq("view", "click", "purchase")

  private val evGen: Gen[Seq[(Timestamp, Long, String)]] = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, for {
      m <- Gen.chooseNum(0L, 240L) // minutes across 4 hours
      u <- Gen.chooseNum(1L, 6L)
      t <- Gen.oneOf(Stages)
    } yield (new Timestamp(m * 60000L), u, t))
  } yield rows

  /** Sequential ladder: per user, per stage, the earliest qualifying ts. */
  private def refCounts(evs: Seq[(Timestamp, Long, String)],
      gapMs: Option[Long]): Map[Int, Long] = {
    val byUser = evs.groupBy(_._2)
    val perUserAnchors = byUser.values.map { rows =>
      Stages.foldLeft(List.empty[Long]) { (anchors, st) =>
        val ok = rows.filter(_._3 == st).map(_._1.getTime).filter { t =>
          anchors.lastOption match {
            case None => anchors.isEmpty // stage 1 unconstrained
            case Some(p) => t >= p && gapMs.forall(g => t - p <= g)
          }
        }
        if (anchors.size < Stages.indexOf(st)) anchors // earlier stage missed
        else if (ok.isEmpty) anchors
        else anchors :+ ok.min
      }
    }
    Stages.indices.map(i =>
      (i + 1) -> perUserAnchors.count(_.size >= i + 1).toLong).toMap
  }

  private def run(evs: Seq[(Timestamp, Long, String)],
      gapSec: Option[Long]): Map[Int, Long] = {
    import spark.implicits._
    val df = evs.toDF("ts", "user_id", "event_type")
    val q = gapSec.fold(EventStream.funnel(df, Stages))(g =>
      EventStream.funnelWindowed(df, Stages, g))
    q.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
  }

  property("funnel == sequential ladder") = forAll(evGen) { evs =>
    run(evs, None) == refCounts(evs, None)
  }

  property("funnelWindowed == sequential gap-bounded ladder") =
    forAll(evGen, Gen.oneOf(600L, 1800L, 3600L)) { (evs, gapSec) =>
      run(evs, Some(gapSec)) == refCounts(evs, Some(gapSec * 1000L))
    }
}
