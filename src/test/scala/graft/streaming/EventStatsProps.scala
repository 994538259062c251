package graft.streaming

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative checks for the round-10 event statistics: on random small
  * event streams (few types, bursty hours, gaps), seasonalBaseline and
  * laggedXcorr must equal independent sequential reference computations —
  * bucket arithmetic, zero-filled spines, floor divisions and all. */
object EventStatsProps extends Properties("graft.streaming.eventstats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val HourUs = 3600000000L
  private val DayUs = 86400000000L

  // events inside ~3 days, two types, minute resolution
  private val evGen: Gen[Seq[(Timestamp, String)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      m <- Gen.chooseNum(0L, 3L * 24 * 60)
      t <- Gen.oneOf("click", "purchase")
    } yield (new Timestamp(m * 60000L), t))
  } yield rows

  private def us(t: Timestamp) = t.getTime * 1000L

  property("seasonalBaseline == sequential reference") = forAll(evGen) { evs =>
    import spark.implicits._
    val got = EventStream.seasonalBaseline(evs.toDF("ts", "event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val cnt = evs.groupBy(e =>
        (e._2, us(e._1) / DayUs, us(e._1) / HourUs % 24))
      .view.mapValues(_.size.toLong).toMap
    val hourTotal = cnt.groupBy { case ((t, _, h), _) => (t, h) }
      .view.mapValues(_.values.sum).toMap
    val nDays = cnt.keySet.groupBy(_._1)
      .view.mapValues(_.map(_._2).size.toLong).toMap
    val want = cnt.map { case (k @ (t, _, h), n) =>
      k -> ((n, hourTotal((t, h)), nDays(t),
        1000L * n * nDays(t) / hourTotal((t, h))))
    }
    got == want
  }

  property("seasonalStreamed == batch seasonalBaseline on random streams") =
    forAll(Gen.resize(30, evGen)) { evs =>
      import spark.implicits._
      val streamed = StreamDriver.seasonalStreamed(spark, evs)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val batch = EventStream.seasonalBaseline(evs.toDF("ts", "event_type"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      streamed == batch
    }

  property("laggedXcorr == sequential reference over the zero-filled spine") =
    forAll(evGen) { evs =>
      import spark.implicits._
      val got = EventStream.laggedXcorr(evs.toDF("ts", "event_type"),
          "click", "purchase", 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
      val buckets = evs.map(e => (e._2, us(e._1) / HourUs))
      val lo = buckets.map(_._2).min
      val hi = buckets.map(_._2).max
      val x = (lo to hi).map(b => buckets.count(e => e._1 == "click" && e._2 == b).toLong)
      val y = (lo to hi).map(b => buckets.count(e => e._1 == "purchase" && e._2 == b).toLong)
      val want = (0 to 3).flatMap { l =>
        val pairs = x.dropRight(l).zip(y.drop(l))
        if (pairs.isEmpty) None
        else {
          val n = pairs.size.toLong
          val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
          val sxy = pairs.map(p => p._1 * p._2).sum
          val sxx = pairs.map(p => p._1 * p._1).sum
          val syy = pairs.map(p => p._2 * p._2).sum
          Some(l.toLong -> ((n, sx, sy, sxy, sxx, syy, n * sxy - sx * sy)))
        }
      }.toMap
      got == want
    }
}
