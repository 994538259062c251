package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over relations the pipeline already produces — the
  * iterative-join workloads (centrality, propagation) a training-data
  * curation stack runs on its content-linkage graphs. */
object Graph {

  /** Undirected content-linkage edges: (a, b) with a < b iff two documents
    * share at least one n-token window whose corpus document frequency is
    * within [2, dfCap] — the same 8-byte window-hash machinery as the
    * substring dedup family, with the df cap as the boilerplate valve
    * that bounds the self-join at Σdf² (capped) like containmentPairs.
    * One shuffle keyed by window hash; pairs dedup BEFORE any downstream
    * consumer sees them. */
  def windowEdges(docs: DataFrame, n: Int = 8, dfCap: Int = 80): DataFrame = {
    require(n >= 2, "window length must be at least 2")
    require(dfCap >= 2, "dfCap below 2 yields no edges")
    val w = docs.select(col("doc_id"),
      explode(array_distinct(
        graft.dedup.Dedup.windowHashes(col("text"), n))).as("h"))
    val keep = w.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
      .select("h")
    val wk = w.join(keep, Seq("h"))
    wk.as("x").join(wk.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Deterministic INTEGER PageRank over an undirected edge list — the
    * content-centrality score behind "which documents sit at the core of
    * the corpus's duplication/linkage structure" (a data-valuation signal:
    * high-centrality docs are the restated ones, low-centrality the
    * novel periphery). All arithmetic is exact integers so any engine
    * reproduces it bit-for-bit: ranks carry a 10^12 scale, each neighbor
    * contribution is (pr·85) div (100·deg) (truncating division — both
    * operands positive, so Spark's `div` and SQL's `//` agree), and each
    * round re-bases at the damping mass (S·15) div 100. Isolated nodes
    * settle at the base mass after round one.
    *
    * Scale shape: the edge list MATERIALIZES once (localCheckpoint — the
    * same lineage cut as the connected-components loop; GraphX does the
    * identical thing) and the `iters` rounds unroll into ONE declarative
    * plan — per round one equi-join of the symmetric edge list against
    * the rank relation plus a map-side-combinable sum, exactly the
    * join+aggregate pair every distributed PageRank runs. Relying on
    * Catalyst exchange reuse instead of the explicit cut re-ran the
    * window-edge self-join per unrolled round at sf1 density (measured:
    * 82.5 s -> 27 s at 50k docs / 45x edges). Fixed small `iters` (the
    * curation signal stabilizes fast); a many-iteration variant would
    * also localCheckpoint each round's ranks. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters in 1..10 (lineage unrolls)")
    val S = 1000000000000L
    val base = S * 15L / 100L
    val e = edges.localCheckpoint()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    var pr = nodes.select(col("doc_id").as("src"), lit(S).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = sym
        .join(pr, "src").join(deg, "src")
        .select(col("dst"), expr("(pr * 85) div (100 * deg)").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
      pr = nodes.select(col("doc_id").as("src"))
        .join(contrib.withColumnRenamed("dst", "src"), Seq("src"), "left")
        .select(col("src"), (lit(base) + coalesce(col("cin"), lit(0L))).as("pr"))
    }
    pr.select(col("src").as("doc_id"), col("pr"))
  }

  /** Per-node triangle participation over an undirected (a < b) edge
    * list — the classic wedge-join workload (local clustering structure:
    * tightly-knit duplication cliques vs loose chains). Wedges join the
    * edge list to itself on the middle vertex (x.b = y.a gives a < b < c
    * for free), a semi-join against the edge relation keeps the closed
    * ones, and each closed triangle credits all three corners through
    * one explode + count. Cost is the wedge count Σ deg(b)² over middle
    * vertices — bounded in this engine's graphs by the window df cap
    * exactly as the pair generation is; the heavier-skew remedy
    * (degree-ordered orientation, bounding wedges by Σ min-degree²) is
    * the documented variant for power-law graphs. All joins are plain
    * equi-joins; the count aggregate is map-side combinable.
    * Output: (doc_id, degree, n_triangles) for every node. */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // the edge relation feeds four plan positions (degree, both wedge
    // sides, the closing semi-join) but must stay DECLARATIVE: Catalyst
    // reuses one edge exchange across all four (identical subtrees),
    // while a localCheckpoint hands AQE an exact size that flips the
    // wedge join to broadcasting the multi-million-row edge list
    // (measured at sf1 density: 15.6 s declarative vs 49.8 s
    // checkpointed — the OPPOSITE trade pageRank/labelPropagation make,
    // where the per-round join partner is the nodes-sized rank relation)
    val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val wedges = edges.as("x").join(edges.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("ta"), col("x.b").as("tb"), col("y.b").as("tc"))
    val tris = wedges.join(edges,
        col("ta") === col("a") && col("tc") === col("b"), "left_semi")
    val perNode = tris
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    nodes.select(col("doc_id"))
      .join(deg.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .join(perNode.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** The composed query: PageRank over the shared-window graph. */
  def contentPageRank(docs: DataFrame, n: Int = 8, dfCap: Int = 80,
      iters: Int = 3): DataFrame =
    pageRank(docs.select("doc_id"), windowEdges(docs, n, dfCap), iters)

  /** Synchronous label propagation communities — the near-linear
    * community detector (vs the min-label connected components in the
    * dedup family, which merges everything reachable: LPA keeps DENSELY
    * linked groups together while letting thin bridges separate). Fully
    * deterministic: every node starts labeled with its own id, and each
    * round every node simultaneously takes the most frequent label among
    * its neighbors, ties to the SMALLEST label (isolated nodes keep their
    * own). Rounds unroll into one declarative plan — per round one
    * equi-join of the symmetric edge list against the label relation, a
    * map-side-combinable (node, label) count, and a per-node argmax via
    * the same max-struct trick as the top-supplier query (no window, no
    * sort): max(struct(cnt, −label)) picks highest count then lowest
    * label. The edge list materializes once (localCheckpoint) like
    * [[pageRank]]; fixed small `iters` — a many-round variant would also
    * localCheckpoint per round.
    * Output: (doc_id, community). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters in 1..10 (lineage unrolls)")
    val e = edges.localCheckpoint()
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    var lab = nodes.select(col("doc_id").as("src"),
      col("doc_id").as("label"))
    for (_ <- 1 to iters) {
      val votes = sym.join(lab, "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst").as("src"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("src"), (-col("m.nl")).as("new_label"))
      lab = nodes.select(col("doc_id").as("src"))
        .join(lab, "src")
        .join(votes, Seq("src"), "left")
        .select(col("src"), coalesce(col("new_label"), col("label"))
          .as("label"))
    }
    lab.select(col("src").as("doc_id"), col("label").as("community"))
  }

  /** [[labelPropagation]] over the shared-window content graph. */
  def contentCommunities(docs: DataFrame, n: Int = 8, dfCap: Int = 80,
      iters: Int = 3): DataFrame =
    labelPropagation(docs.select("doc_id"), windowEdges(docs, n, dfCap),
      iters)

  /** Bounded k-core peeling — the density filter behind "which documents
    * sit in a tightly interlinked cluster" (a stronger cohesion signal
    * than degree: a hub touching many leaves dies, a clique survives).
    * Each of `rounds` SYNCHRONOUS rounds drops every node whose degree in
    * the current subgraph is < k, then the edges touching it; the
    * operator is deterministically "R rounds of peeling", NOT
    * "iterate-to-fixpoint", so an engine running the same R rounds
    * reproduces it exactly at any scale (the spec pins that R rounds
    * reach the true k-core fixpoint on the fixture). Per round: one
    * map-side-combinable degree count of the edge list and two semi-joins
    * back onto it, with a localCheckpoint cutting the unrolled lineage
    * (same discipline as the CC loop); all relations are edge-bounded and
    * shrink monotonically. Output: (doc_id, core_degree) for nodes with
    * surviving edges after round R. */
  def kCore(edges: DataFrame, k: Int = 3, rounds: Int = 4): DataFrame = {
    require(k >= 1, "k >= 1")
    require(rounds >= 1 && rounds <= 16, "rounds in 1..16 (lineage unrolls)")
    var alive = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = alive.select(col("a").as("v"))
        .unionAll(alive.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("v")
      val pruned = alive
        .join(keep, alive("a") === keep("v"), "left_semi")
        .join(keep, alive("b") === keep("v"), "left_semi")
      val next = pruned.localCheckpoint()
      graft.scale.Checkpoints.drop(alive)
      alive = next
    }
    alive.select(col("a").as("doc_id"))
      .unionAll(alive.select(col("b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("core_degree"))
  }

  /** [[kCore]] over the shared-window content graph. */
  def contentKCore(docs: DataFrame, n: Int = 8, dfCap: Int = 80,
      k: Int = 3, rounds: Int = 4): DataFrame =
    kCore(windowEdges(docs, n, dfCap), k, rounds)

}
