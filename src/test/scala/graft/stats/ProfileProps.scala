package graft.stats

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative checks for the profiling statistics: group CDF against a
  * sequential rank-share reference, and joinSize against the EXECUTED
  * join — on random small relations with dense key/value collisions. */
object ProfileProps extends Properties("graft.stats.profile") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val gvGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-3L, 5L)
    } yield (g, v))
  } yield rows

  property("groupCdf == sequential rank shares over distinct values") =
    forAll(gvGen) { rows =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = Profile.groupCdf(rows.toDF("g", "v"), "g", col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, grp) =>
        val vs = grp.map(_._2)
        val n = vs.size.toLong
        vs.distinct.map { v =>
          val le = vs.count(_ <= v).toLong
          (g, v) -> ((le, n, le * 1000000L / n))
        }
      }
      got == want
    }

  private val skewGen: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(1, 50)
    ks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield ks

  property("keySkew == sequential top-k with (count desc, key asc) ties") =
    forAll(skewGen, Gen.chooseNum(1, 6)) { (keys, k) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = Profile.keySkew(keys.toDF("k"), col("k"), k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      val cnt = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nRows = keys.size.toLong
      val top = cnt.toSeq.sortBy(p => (-p._2, p._1)).take(k)
      var cum = 0L
      val want = top.zipWithIndex.map { case ((key, n), i) =>
        cum += n
        ((i + 1).toLong, key, n, n * 1000000L / nRows,
          cum * 1000000L / nRows, cnt.size.toLong, nRows)
      }
      got == want
    }

  private val quasiGen: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      q1 <- Gen.chooseNum(1L, 3L)
      q2 <- Gen.oneOf("A", "B")
      sv <- Gen.oneOf("x", "y", "z")
    } yield (q1, q2, sv))
  } yield rows

  property("kAnonymity and lDiversity == sequential group audits") =
    forAll(quasiGen, Gen.chooseNum(1L, 5L), Gen.chooseNum(1L, 3L)) {
      (rows, k, l) =>
        import spark.implicits._
        val df = rows.toDF("q1", "q2", "sv")
        val grp = rows.groupBy(r => (r._1.toString, r._2))
        val wantK = grp.view.mapValues(_.size.toLong)
          .filter(_._2 < k).toMap
        val gotK = Profile.kAnonymity(df, Seq("q1", "q2"), k).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val wantL = grp.view
          .mapValues(g => (g.size.toLong, g.map(_._3).distinct.size.toLong))
          .filter(_._2._2 < l).toMap
        val gotL = Profile.lDiversity(df, Seq("q1", "q2"), "sv", l).collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            ((r.getLong(2), r.getLong(3)))).toMap
        gotK == wantK && gotL == wantL
    }

  private val keysGen: Gen[(Seq[Long], Seq[Long])] = for {
    na <- Gen.chooseNum(0, 25); nb <- Gen.chooseNum(0, 25)
    a <- Gen.listOfN(na, Gen.chooseNum(1L, 6L))
    b <- Gen.listOfN(nb, Gen.chooseNum(1L, 6L))
  } yield (a, b)

  property("joinSize == the executed join's count, hot key and sides exact") =
    forAll(keysGen) { case (a, b) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val da = a.toDF("ka"); val db = b.toDF("kb")
      val r = Profile.joinSize(da, "ka", db, "kb").collect().head
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val prods = ca.keySet.intersect(cb.keySet).toSeq
        .map(k => ca(k) * cb(k))
      val executed = da.join(db, col("ka") === col("kb")).count()
      r.getLong(0) == executed &&
        r.getLong(0) == prods.sum &&
        r.getLong(1) == prods.size.toLong &&
        r.getLong(2) == (if (prods.isEmpty) 0L else prods.max) &&
        r.getLong(3) == ca.size.toLong && r.getLong(4) == cb.size.toLong
    }

  // --- quantileSketch vs a SEQUENTIAL mirror of the same md5-coin
  // algorithm, on the distribution shapes that break sampling sketches:
  // sorted runs, constant-heavy (90% one value), and a Zipf head (value
  // n div i: half the rows tie at 1, a long rare tail above). The mirror
  // recomputes coin/level/survivors/weighted-rank row by row, so any
  // divergence in the DISTRIBUTED plan (partitioning, map-side combine,
  // window frame, zero-survivor fallback) fails EXACTLY, not
  // statistically.

  /** The sampling coin, sequentially: last 8 md5 hex chars of the
    * decimal key string (mirrors Profile.sketchCoin on a LONG key). */
  private def md5Coin(key: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(24, 32), 16)
  }

  /** Sequential quantileSketch: (n, level, n_sample, est per p);
    * estimates None when no row survives the coin. */
  private def seqSketch(vs: Seq[Long], cap: Int,
      ps: Seq[Int]): (Long, Long, Long, Seq[Option[Long]]) = {
    val n = vs.size.toLong
    val cd = (n + cap - 1) / cap
    val level = if (cd <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(cd - 1)
    val w = 1L << level
    // key = row index (the generators key rows by index)
    val surv = vs.zipWithIndex.collect {
      case (v, i) if md5Coin(i.toLong) % w == 0 => v
    }
    val ests = ps.map { p =>
      val target = (n * p + 99) / 100
      if (surv.isEmpty) None
      else {
        val sorted = surv.sorted
        val cums = sorted.zipWithIndex.map { case (v, i) => (v, (i + 1) * w) }
        Some(cums.collectFirst { case (v, c) if c >= target => v }
          .getOrElse(sorted.last))
      }
    }
    (n, level.toLong, surv.size.toLong, ests)
  }

  private def sketchShapeProp(shape: Int => Int => Long) =
    forAll(Gen.chooseNum(50, 3000), Gen.oneOf(16, 64)) { (n, cap) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val vs = (0 until n).map(shape(n))
      val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
        .toDF("g", "v", "k")
      val r = Profile.quantileSketch(df, "g", col("v"), col("k"),
        Seq(50, 90, 99), cap).collect().head
      val (wn, wl, wm, we) = seqSketch(vs, cap, Seq(50, 90, 99))
      def est(i: Int): Option[Long] =
        if (r.isNullAt(4 + i)) None else Some(r.getLong(4 + i))
      r.getLong(1) == wn && r.getLong(2) == wl && r.getLong(3) == wm &&
        (0 until 3).forall(i => est(i) == we(i))
    }

  property("quantileSketch == sequential mirror on SORTED input") =
    sketchShapeProp(_ => i => i.toLong)

  property("quantileSketch == sequential mirror on CONSTANT-HEAVY input") =
    sketchShapeProp(_ => i => if (i % 10 == 0) i.toLong else 7L)

  property("quantileSketch == sequential mirror on ZIPF input") =
    sketchShapeProp(n => i => n.toLong / (i + 1))

  // the round-11 single-distinct reshape must equal the definitional
  // computation — per ordered pair: n_lhs = |π_X|, n_pairs = |π_{X,Y}|,
  // violations = difference, holds = equality — on random relations
  // with dense value collisions (incl. duplicate rows and constant
  // columns, the degenerate FD shapes)
  private val fdGen: Gen[Seq[(Long, String, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 6L)
      b <- Gen.oneOf("x", "y", "z")
      c <- Gen.chooseNum(0L, 2L)
    } yield (a, b, c))
  } yield rows

  property("functionalDeps == brute-force projections on random relations") =
    forAll(fdGen) { rows =>
      import spark.implicits._
      val cols = Seq("a", "b", "c")
      val got = Profile.functionalDeps(rows.toDF("a", "b", "c"), cols)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      val proj: Map[String, Seq[String]] = Map(
        "a" -> rows.map(_._1.toString), "b" -> rows.map(_._2),
        "c" -> rows.map(_._3.toString))
      val want = (for { x <- cols; y <- cols if x != y } yield {
        val d1 = proj(x).distinct.size.toLong
        val d2 = proj(x).zip(proj(y)).distinct.size.toLong
        (x, y) -> ((d1, d2, d2 - d1, d2 == d1))
      }).toMap
      got == want
    }
}
