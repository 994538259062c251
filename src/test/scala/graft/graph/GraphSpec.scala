package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")

  test("windowEdges: shared-window pairs only, df cap drops boilerplate") {
    import spark.implicits._
    val a8 = toks("a", 8); val b8 = toks("b", 8); val c8 = toks("c", 8)
    val fix = Seq(
      (1L, s"$a8 u1"),        // shares A with 2
      (2L, s"$a8 $b8"),       // shares A with 1, B with 3
      (3L, s"$b8 v1"),        // shares B with 2
      (4L, toks("x", 8)),     // isolated
      // C appears in 5 docs: df 5 > cap 4 -> no C edges
      (5L, c8), (6L, c8), (7L, c8), (8L, c8), (9L, c8))
      .toDF("doc_id", "text")
    val edges = Graph.windowEdges(fix, 8, dfCap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (2L, 3L)))
  }

  test("pageRank: three exact integer rounds on a path graph, isolated at base") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.pageRank(nodes, edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // hand-unrolled: S=1e12, base=1.5e11, contrib=(pr*85) div (100*deg)
    // p1 = (575e9, 1850e9, 575e9, 150e9)
    // p2 = (936.25e9, 1127.5e9, 936.25e9, 150e9)
    // p3 = (629.1875e9, 1741.625e9, 629.1875e9, 150e9)
    assert(got == Map(
      1L -> 629187500000L, 2L -> 1741625000000L,
      3L -> 629187500000L, 4L -> 150000000000L))
    // total mass conservation is NOT expected (truncating div leaks), but
    // symmetry of the path endpoints is exact
    assert(got(1L) == got(3L))
  }

  test("triangleCounts: wedges close only when the third edge exists") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // triangle 1-2-3; pendant edge 3-4; isolated 5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val m = Graph.triangleCounts(nodes, edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(m == Map(
      1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((3L, 1L)),
      4L -> ((1L, 0L)), 5L -> ((0L, 0L))))
  }

  test("contentPageRank: restated docs outrank the novel periphery") {
    import spark.implicits._
    val a8 = toks("a", 8)
    // doc 2 restates 1 and 3's shared content -> the hub; 4 is novel
    val fix = Seq(
      (1L, s"$a8 u1"), (2L, s"$a8 w1"), (3L, s"$a8 v1"),
      (4L, toks("z", 8)))
      .toDF("doc_id", "text")
    val pr = Graph.contentPageRank(fix, 8, 80, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1,2,3 form a triangle (all share A): equal ranks above the base
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L))
    assert(pr(1L) > pr(4L) && pr(4L) == 150000000000L)
  }

  test("labelPropagation: dense groups keep their min label, isolated keep their own") {
    import spark.implicits._
    // two triangles {1,2,3} and {10,11,12}; node 20 isolated. After one
    // sync round every triangle member sees two neighbor labels (tie)
    // -> min label; rounds 2-3 are stable.
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val r = Graph.labelPropagation(nodes, edges, 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("labelPropagation: majority beats minimum — the vote is by count") {
    import spark.implicits._
    // node 5's neighbors: labels {1} once, {7} twice after round 1 setup:
    // direct fixture — neighbors 1, 7, 8 where 7,8 share label 7 after
    // round 1 (7-8 edge, both > 7's partner)... keep it single-round
    // readable: neighbors of 5 = {1, 7, 8}; 7 and 8 are ALSO connected
    // to each other. Round 1: node 5 sees labels 1,7,8 (all once) -> min
    // 1. Node 7 sees {5,8} -> 5; node 8 sees {5,7} -> 5. Round 2: node 5
    // sees labels {1, 5, 5} -> 5 wins BY COUNT over the smaller 1.
    val nodes = Seq(1L, 5L, 7L, 8L).toDF("doc_id")
    val edges = Seq((1L, 5L), (5L, 7L), (5L, 8L), (7L, 8L)).toDF("a", "b")
    val r2 = Graph.labelPropagation(nodes, edges, 2).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r2(5L) == 5L)
  }

  test("kCore: pendant tail peels, triangle survives, k above density empties") {
    import spark.implicits._
    // triangle 1-2-3 with a tail 3-4-5: k=2 peels 5 then 4, keeps the
    // triangle; k=3 empties (max core degree is 2)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val r = Graph.kCore(edges, 2, 4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(Graph.kCore(edges, 3, 4).collect().isEmpty)
    // one round is NOT enough for the 2-tail: bounded peeling is honest
    // about its round count (5 dies in round 1, 4 only in round 2)
    val r1 = Graph.kCore(edges, 2, 1).collect().map(_.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L))
  }

  test("kCore: rounds at fixpoint are idempotent on the real content graph") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val e = Graph.windowEdges(docs, 8, 80)
    val r4 = Graph.contentKCore(docs, 8, 80, 2, 4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val r5 = Graph.kCore(e, 2, 5).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r4 == r5) // 4 rounds reach the true 2-core on this fixture
  }
}
