package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hub-node skew evidence for the iterative graph rounds (r5 verdict
  * item 6, widened per r6 item 5). The AQE skew-split plan guard
  * elsewhere covers a generic SMJ; the REAL 100-TB risk in the graph
  * family is a power-law hub whose rows all land in one shuffle
  * partition of a round's edge-scale join. This spec builds ONE
  * synthetic power-law graph with a 10⁴× hub and drives it through
  * each round shape the production queries run —
  *
  *   - pagerank's contribution join (edges⋈ranks on src, agg by dst),
  *   - label-prop's label join (edges⋈labels on src, min-label by dst),
  *   - kcore's peel semi-join (edges ⋉ keep on dst),
  *   - closeness/BFS's frontier join (edges⋈frontier on src) —
  *
  * under AQE with production-shaped skew thresholds (scaled to toy
  * bytes), asserting for EACH shape that (a) AQE actually split the hub
  * partition — the executed plan carries a skew-handled join — and
  * (b) the round's arithmetic is exactly right under the split.
  *
  * Two operational findings are encoded here because the next engineer
  * will hit them: the non-edges side must arrive MATERIALIZED
  * (localCheckpoint — an un-materialized distinct leaves a final agg
  * between the shuffle stage and the join's sort, which
  * OptimizeSkewedJoin cannot split through), and rounds that
  * re-aggregate right after the join need forceOptimizeSkewedJoin
  * (AQE's no-extra-shuffle heuristic would veto the split even though
  * the agg re-exchanges anyway).
  */
class GraphSkewSpec extends SparkSpec {

  /** SYMMETRIC hub graph: node 0 touches 10⁵ spokes (src key 0 carries
    * 10⁵ rows in ONE shuffle partition); background cold-hubs
    * 200000+j (j<100) each touch the 100 spokes i ≡ j (mod 100),
    * i ≤ 10⁴ — so min-degree spokes have 1-2 edges and the hub is a
    * worse-than-10⁴× outlier.
    */
  private val hubDeg = 100000L

  private def hubEdges: DataFrame = {
    import spark.implicits._
    val spokes = 1L to hubDeg
    (spokes.map(i => (i, 0L)) ++ spokes.map(i => (0L, i))
      ++ (1L to 10000L).flatMap(i =>
        Seq((i, 200000L + i % 100), (200000L + i % 100, i))))
      .toDF("src", "dst")
  }

  /** Production-shaped AQE skew conf (5× median / 256 MB / 64 MB in
    * production, scaled to the toy's bytes so the SAME mechanism
    * triggers at test size), restored afterwards.
    */
  private def withSkewConf[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  private def assertSkewHandled(df: DataFrame, shape: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the $shape join skew-handled:\n$plan")
  }

  test("pagerank contribution round survives a 1e4x hub: AQE splits the skew") {
    val edges = hubEdges
    // ranks arrive as a MATERIALIZED per-round frame (exactly
    // q_pagerank's localCheckpoint discipline) — see class doc
    val ranks = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("pr"), lit(2L).as("deg"))
      .localCheckpoint(true)
    withSkewConf {
      // ONE pagerank contribution round, the q_pagerank shape (r15):
      // ranks shuffle-hash-join onto edges by src — the node-scale
      // side is the hinted build side, edges stream, and the skewed
      // STREAM partition is what AQE splits
      val contrib = edges
        .join(ranks.hint("shuffle_hash"), edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      val rows = contrib.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // correctness under the split: the hub receives one half-rank
      // (pr div deg = 500000) from each of its spokes; cold node
      // 200000 from its 100 (i ≡ 0 mod 100) neighbors
      assert(rows(0L) == hubDeg * 500000L, s"hub mass wrong: ${rows(0L)}")
      assert(rows(200000L) == 100L * 500000L, "cold-node mass wrong")
      assertSkewHandled(contrib, "pagerank contribution")
    }
  }

  test("label-prop round survives the hub: AQE splits the label join") {
    val edges = hubEdges
    // every node starts as its own label — q_label_prop's init — and
    // the labels frame is materialized per round like the body does
    val labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    withSkewConf {
      // one min-label round, the labelPropRound shape (r15): labels
      // shuffle-hash-join edges on src (the hub's 10⁵ rows in one
      // stream partition), min by dst
      val prop = edges
        .join(labels.hint("shuffle_hash"), edges("src") === labels("node"))
        .groupBy("dst").agg(min(col("lbl")).as("nl"))
      val rows = prop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // exact min-label arithmetic under the split: the hub's best
      // neighbor is spoke 1; spoke 1's is the hub (0); cold-hub
      // 200000's neighbors are {i ≤ 10⁴ : i ≡ 0 (mod 100)} → min 100
      assert(rows(0L) == 1L, s"hub min-label wrong: ${rows(0L)}")
      assert(rows(1L) == 0L, s"spoke min-label wrong: ${rows(1L)}")
      assert(rows(200000L) == 100L, s"cold-hub min-label wrong: ${rows(200000L)}")
      assertSkewHandled(prop, "label-prop")
    }
  }

  test("kcore peel semi-join survives the hub: AQE splits the dst probe") {
    val edges = hubEdges
    // keep-set for k=50: the hub (deg 10⁵) and the 100 cold-hubs
    // (deg 100); spokes (deg ≤ 2) peel away — kcoreRound's dst-side
    // left-semi probe, with the hub's 10⁵ dst rows in one partition
    val keep = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 50)
      .select("node")
      .localCheckpoint(true)
    withSkewConf {
      val survived = edges.hint("merge")
        .join(keep, edges("dst") === keep("node"), "left_semi")
      // collect() (not count()) — count() is a SEPARATE QueryExecution,
      // so the skew assert below would read an un-executed plan
      val n = survived.collect().length.toLong
      // exact survivor census under the split: dst = hub keeps the 10⁵
      // spoke→hub edges; dst ∈ cold-hubs keeps the 10⁴ spoke→cold
      // edges; nothing else points at a kept node
      assert(n == hubDeg + 10000L, s"peel survivor count wrong: $n")
      assertSkewHandled(survived, "kcore peel")
    }
  }

  test("frontier expansion survives a hub frontier: AQE splits the src join") {
    val edges = hubEdges
    // the closeness/BFS round shape (r15): the frontier holds the HUB,
    // so the edges⋈frontier join on src concentrates all 10⁵ hub rows
    // in one stream partition; broadcast is disabled (at 100 TB a deep
    // frontier does not broadcast), so this is the shuffled-hash join
    // the production round degrades to on a power-law graph
    import spark.implicits._
    val frontier = Seq(0L).toDF("node").localCheckpoint(true)
    withSkewConf {
      val next = edges
        .join(frontier.hint("shuffle_hash"),
          edges("src") === frontier("node"))
        .select(col("dst")).distinct()
      val n = next.collect().length.toLong
      assert(n == hubDeg, s"frontier expansion reached $n, want $hubDeg")
      assertSkewHandled(next, "frontier expansion")
    }
  }
}
