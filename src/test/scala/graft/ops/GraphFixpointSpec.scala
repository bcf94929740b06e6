package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run-to-fixpoint production variants of the gated graph rounds
  * (r5 verdict item 5). The ORACLED queries stay fixed-round (that is
  * what keeps them engine-checkable — the DuckDB twin unrolls the same
  * rounds); these specs prove the driver-convergence-flag variants land
  * on the SAME state as running the gated round "enough" times, on a
  * toy graph whose fixpoint needs MORE rounds than the gated twins run
  * (so the equivalence is not vacuous) and on the real sf0.001 graph.
  */
class GraphFixpointSpec extends SparkSpec {

  /** Symmetric edge frame from undirected (u, v) pairs. */
  private def sym(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
      .repartition(col("src")).persist()
  }

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // 4-clique {0,2,4,6} with a 5-node chain hanging off node 0: under
  // k = 2 the chain peels ONE NODE PER ROUND (5 rounds — more than any
  // gated twin runs), the clique survives. Node ids even/odd-mixed so
  // nothing depends on the bipartite encoding.
  private lazy val toy = sym(
    (0L, 2L), (0L, 4L), (0L, 6L), (2L, 4L), (2L, 6L), (4L, 6L),
    (0L, 11L), (11L, 13L), (13L, 15L), (15L, 17L), (17L, 19L))

  test("kcoreFixpoint: converged toy core == enough gated rounds, needs > 3 rounds") {
    val clique = Set[(Long, Long)](
      (0L, 2L), (0L, 4L), (0L, 6L), (2L, 4L), (2L, 6L), (4L, 6L),
      (2L, 0L), (4L, 0L), (6L, 0L), (4L, 2L), (6L, 2L), (6L, 4L))
    val fix = edgeSet(Graph.kcoreFixpoint(toy, k = 2))
    assert(fix == clique, "fixpoint is not the 2-core (the 4-clique)")
    // gated: 10 rounds of the SAME round primitive the oracled q_kcore runs
    var gated = toy
    for (_ <- 1 to 10) gated = Graph.kcoreRound(gated, 2).localCheckpoint(true)
    assert(edgeSet(gated) == fix, "fixpoint diverges from enough gated rounds")
    // the equivalence is non-vacuous: 3 gated rounds (the oracled twin's
    // budget) have NOT converged on this chain
    var three = toy
    for (_ <- 1 to 3) three = Graph.kcoreRound(three, 2).localCheckpoint(true)
    assert(edgeSet(three) != fix, "toy graph too easy: 3 rounds already converged")
  }

  test("labelPropFixpoint: converged toy labels == enough gated rounds") {
    // a 7-node path: min-label propagation needs diameter (6) rounds —
    // twice the gated twin's 3
    val path = sym((1L, 3L), (3L, 5L), (5L, 7L), (7L, 9L), (9L, 11L), (11L, 13L))
    val fix = Graph.labelPropFixpoint(path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fix.values.toSet == Set(1L), "path fixpoint must label everything 1")
    var labels = path.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).localCheckpoint(true)
    for (_ <- 1 to 12) labels = Graph.labelPropRound(path, labels).localCheckpoint(true)
    val gated = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gated == fix, "fixpoint diverges from enough gated rounds")
  }

  test("bfsFixpoint: converged toy depths == known hop distances") {
    val g = sym((1L, 3L), (3L, 5L), (5L, 7L), (1L, 9L), (9L, 7L), (20L, 21L))
    val fix = Graph.bfsFixpoint(g, seed = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1 → {3, 9} → {5, 7} → done; the (20, 21) component is unreachable
    assert(fix == Map(1L -> 0L, 3L -> 1L, 9L -> 1L, 5L -> 2L, 7L -> 2L))
  }

  test("kcoreFixpoint on the real sf0.001 graph == enough gated rounds") {
    val edges = Graph.kcoreEdges(spark, sfDir)
    val fix = edgeSet(Graph.kcoreFixpoint(edges, k = 8))
    var gated = edges
    for (_ <- 1 to 12) gated = Graph.kcoreRound(gated, 8).localCheckpoint(true)
    assert(edgeSet(gated) == fix,
      "real-graph fixpoint diverges from 12 gated rounds")
  }

  // ── wedge core: the analytic wedge count equals the counted join ────
  test("wedgeCore.nWedges equals the directly-counted wedge join") {
    // round 11 computes n_wedges as Σ_src C(outdeg, 2) so the closure
    // join never materializes twice; this law pins the identity against
    // the join it replaced
    import org.apache.spark.sql.functions._
    val wc = Graph.wedgeCore(spark, sfDir)
    val pairs = Graph.wedgePairsRaw(spark, sfDir).persist()
    val deg = pairs.select(col("u").as("node"))
      .unionByName(pairs.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val ori = pairs
      .join(deg.select(col("node").as("un"), col("dg").as("ud")),
        col("u") === col("un"))
      .join(deg.select(col("node").as("vn"), col("dg").as("vd")),
        col("v") === col("vn"))
      .select(
        when(struct(col("ud"), col("u")) < struct(col("vd"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(struct(col("ud"), col("u")) < struct(col("vd"), col("v")),
          col("v")).otherwise(col("u")).as("dst"))
      .persist()
    val counted = ori.as("a")
      .join(ori.as("b"), col("a.src") === col("b.src")
        && col("a.dst") < col("b.dst"))
      .count()
    assert(wc.nWedges === counted,
      s"analytic wedge count ${wc.nWedges} != joined count $counted")
    assert(wc.nEdges === pairs.count())
    pairs.unpersist(); ori.unpersist()
  }
}
