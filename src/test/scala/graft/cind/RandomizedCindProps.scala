package graft.cind

import graft.core.Capture
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative end-to-end check: on random triple multisets over a small
  * vocabulary (dense co-occurrence, lots of boundary cases: equal value
  * sets, empty intersections, duplicate triples, hub values), the engine's
  * CIND set must equal the first-principles brute-force oracle. Catches
  * edge cases the hand fixtures cannot enumerate. */
object RandomizedCindProps extends Properties("graft.cind.e2e") {

  // Spark jobs per case are expensive; 8 random multisets is plenty on top
  // of the deterministic fixtures.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark = graft.SparkSpec.session

  private val term = Gen.oneOf("a", "b", "c", "d")
  private val triple = for {
    s <- term; p <- Gen.oneOf("p", "q"); o <- term
  } yield (s, p, o)
  private val triples = Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, triple))

  private def key(r: CindRow) = (Capture(r.dep_code, r.dep_v1, r.dep_v2),
    Capture(r.ref_code, r.ref_v1, r.ref_v2), r.support)

  property("allCinds == bruteForce on random triple multisets") =
    forAll(triples) { ts =>
      import spark.implicits._
      val df = ts.toDF("subj", "pred", "obj")
      val got = CindEngine.allCinds(df, minSupport = 2).collect().map(key).toSet
      val want = BruteForce(ts, 2)
      if (got != want) {
        println(s"triples=$ts\nmissing=${want -- got}\nextra=${got -- want}")
      }
      got == want
    }

  property("two-round strategy matches brute force on random multisets") =
    forAll(triples) { ts =>
      import spark.implicits._
      val df = ts.toDF("subj", "pred", "obj")
      val got = CindEngine.allCindsTwoRound(df, minSupport = 2, expectedPairs = 128)
        .collect().map(key).toSet
      got == BruteForce(ts, 2)
    }

  property("small-to-large strategy matches brute force on random multisets") =
    forAll(triples) { ts =>
      import spark.implicits._
      val df = ts.toDF("subj", "pred", "obj")
      val got = CindEngine.allCindsSmallToLarge(df, minSupport = 2)
        .collect().map(key).toSet
      val want = BruteForce(ts, 2)
      if (got != want) {
        println(s"triples=$ts\nmissing=${want -- got}\nextra=${got -- want}")
      }
      got == want
    }

  property("hybrid strategy matches brute force on random multisets") =
    forAll(triples) { ts =>
      import spark.implicits._
      val df = ts.toDF("subj", "pred", "obj")
      // spill 2 forces a dense mix of exact and Bloom evidences on these
      // small lines — both halves of the hybrid buffer stay live
      val got = CindEngine.allCindsHybrid(df, minSupport = 2, spillThreshold = 2)
        .collect().map(key).toSet
      val want = BruteForce(ts, 2)
      if (got != want) {
        println(s"triples=$ts\nmissing=${want -- got}\nextra=${got -- want}")
      }
      got == want
    }

  // the full option stack (AR pruning + both Bloom paths) composed onto two
  // structurally different strategies must agree on arbitrary inputs — the
  // randomized counterpart of MainSpec's fixture flag matrix
  property("AR + Bloom composition: count-match and small-to-large agree") =
    forAll(triples) { ts =>
      import spark.implicits._
      val df = ts.toDF("subj", "pred", "obj")
      val rules = CindEngine.preparedRules(df, 2)
      val a = CindEngine.allCinds(df, minSupport = 2,
        bloomConditions = true, bloomCaptures = true, arRules = Some(rules))
        .collect().map(key).toSet
      val b = CindEngine.allCindsSmallToLarge(df, minSupport = 2,
        bloomConditions = true, bloomCaptures = true, arRules = Some(rules))
        .collect().map(key).toSet
      if (a != b) println(s"triples=$ts\nonly-cm=${a -- b}\nonly-s2l=${b -- a}")
      a == b
    }
}
