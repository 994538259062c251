package graft.rdf

import graft.SparkSpec

class BgpSpec extends SparkSpec {

  private def t(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj")
  }

  test("bgpStar: ALL constraints must hold; projection pred drives the output") {
    val fix = t(
      ("o1", "status", "F"), ("o1", "priority", "HI"), ("o1", "customer", "c9"),
      ("o2", "status", "F"), ("o2", "customer", "c8"),            // missing priority
      ("o3", "status", "O"), ("o3", "priority", "HI"), ("o3", "customer", "c7"),
      ("o4", "status", "F"), ("o4", "priority", "HI"))            // no projection triple
    val r = TripleStats.bgpStar(fix,
        Seq(("status", "F"), ("priority", "HI")), "customer")
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r == Seq(("o1", "c9")))
  }

  test("bgpOptional: missing optional triples survive with the sentinel") {
    val fix = t(
      ("l1", "part", "p1"), ("l1", "flag", "R"),
      ("l2", "part", "p2"),                      // no flag: sentinel
      ("l3", "flag", "R"))                       // no required part: dropped
    val r = TripleStats.bgpOptional(fix, Seq(), "part", "flag")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2)))
      .sorted.toSeq
    assert(r == Seq(("l1", "p1", "R"), ("l2", "p2", "__none__")))
  }

  test("bgpMinus: the excluded triple removes its subject, others survive") {
    val fix = t(
      ("o1", "status", "F"), ("o1", "priority", "HI"), ("o1", "customer", "c1"),
      ("o2", "status", "F"), ("o2", "priority", "LO"), ("o2", "customer", "c2"),
      ("o3", "status", "F"), ("o3", "customer", "c3")) // no priority at all
    val r = TripleStats.bgpMinus(fix, Seq(("status", "F")),
        "customer", "priority", "HI")
      .collect().map(x => (x.getString(0), x.getString(1))).sorted.toSeq
    assert(r == Seq(("o2", "c2"), ("o3", "c3")))
  }

  test("pathClosure: all path lengths, diamond dedup, cycle terminates") {
    // chain a->b->c->d plus a shortcut a->c (diamond: a reaches c two
    // ways, once in the closure) and an unrelated predicate edge
    val fix = t(
      ("a", "ref", "b"), ("b", "ref", "c"), ("c", "ref", "d"),
      ("a", "ref", "c"),
      ("a", "other", "z"))
    val r = TripleStats.pathClosure(fix, Seq("ref"))
      .collect().map(x => (x.getString(0), x.getString(1))).sorted.toSeq
    assert(r == Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    // a 3-cycle: every node reaches every node INCLUDING itself (x p+ x
    // holds when a cycle returns); the anti-join empties the frontier
    val cyc = t(("x", "ref", "y"), ("y", "ref", "z"), ("z", "ref", "x"))
    val rc = TripleStats.pathClosure(cyc, Seq("ref")).count()
    assert(rc == 9L)
    // multi-predicate union: both predicates traverse
    val mixed = t(("s", "p1", "m"), ("m", "p2", "e"))
    val rm = TripleStats.pathClosure(mixed, Seq("p1", "p2"))
      .collect().map(x => (x.getString(0), x.getString(1))).sorted.toSeq
    assert(rm == Seq(("m", "e"), ("s", "e"), ("s", "m")))
  }

  test("bgpChain: multi-hop traversal ends at the path's terminal object") {
    val fix = t(
      ("o1", "customer", "c1"), ("c1", "nation", "n1"), ("n1", "name", "FR"),
      ("o2", "customer", "c2"), ("c2", "nation", "n2"),           // n2 has no name
      ("o3", "customer", "c3"))                                   // chain breaks at hop 2
    val r = TripleStats.bgpChain(fix, Seq("customer", "nation", "name"))
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r == Seq(("o1", "FR")))
    // branching: a subject with TWO matching paths yields both rows
    val branched = fix.unionByName(t(("c1", "nation", "n9"), ("n9", "name", "DE")))
    val r2 = TripleStats.bgpChain(branched, Seq("customer", "nation", "name"))
      .collect().map(x => (x.getString(0), x.getString(1))).sorted.toSeq
    assert(r2 == Seq(("o1", "DE"), ("o1", "FR")))
  }

  test("degreeDistribution: out over subjects, in over objects") {
    // subjects: a emits 3, b emits 1 -> out: (1,1),(3,1)
    // objects: x receives 2, y 1, b 1 -> in: (1,2),(2,1)
    val fix = t(
      ("a", "p", "x"), ("a", "p", "y"), ("a", "q", "x"), ("b", "p", "b"))
    val r = TripleStats.degreeDistribution(fix).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set(
      ("out", 1L, 1L), ("out", 3L, 1L),
      ("in", 1L, 2L), ("in", 2L, 1L)))
  }

  test("characteristicSets: predicate-set shapes, duplicates collapse, sorted") {
    val fix = t(
      ("s1", "name", "x"), ("s1", "age", "1"), ("s1", "age", "2"), // dup pred
      ("s2", "age", "3"), ("s2", "name", "y"),                     // same shape
      ("s3", "name", "z"))                                         // smaller shape
    val r = TripleStats.characteristicSets(fix, 10).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("age name", 2L, 2L), ("name", 1L, 1L)))
  }

  test("predicateCooccurrence: unordered pairs, duplicate triples collapse") {
    val fix = t(
      ("s1", "name", "x"), ("s1", "age", "1"), ("s1", "age", "2"),
      ("s2", "age", "3"), ("s2", "name", "y"), ("s2", "city", "c"),
      ("s3", "name", "z"))
    val r = TripleStats.predicateCooccurrence(fix).collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(r == Map(
      ("age", "name") -> 2L,
      ("age", "city") -> 1L,
      ("city", "name") -> 1L))
  }
}
