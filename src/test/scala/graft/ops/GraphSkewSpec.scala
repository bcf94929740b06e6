package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hub-node skew evidence for the iterative graph rounds (r5 verdict
  * item 6). The AQE skew-split plan guard elsewhere covers a generic
  * SMJ; the REAL 100-TB risk in pagerank/label-prop is a power-law hub
  * whose contribution rows all land in one shuffle partition of the
  * edges⋈ranks join. This spec builds a synthetic power-law graph with
  * a 10⁴× hub, runs ONE pagerank-shaped contribution round under AQE
  * with production-shaped skew thresholds (scaled to toy bytes), and
  * asserts (a) AQE actually split the hub partition — the plan carries
  * a skew-handled join — and (b) the round's arithmetic is exactly
  * right under the split (the hub's rank mass equals the closed form).
  */
class GraphSkewSpec extends SparkSpec {

  test("pagerank contribution round survives a 1e4x hub: AQE splits the skew") {
    import spark.implicits._
    // SYMMETRIC hub (the pagerank edge shape): node 0 touches 10⁵
    // spokes, so the contribution join's src key 0 carries 10⁵ rows in
    // ONE shuffle partition; background cold nodes have degree ≤ ~200 —
    // a worse-than-10⁴× hub over the min-degree (1-edge) spokes
    val hubDeg = 100000L
    val spokes = 1L to hubDeg
    val edges = (spokes.map(i => (i, 0L)) ++ spokes.map(i => (0L, i))
      ++ (1L to 10000L).flatMap(i =>
        Seq((i, 200000L + i % 100), (200000L + i % 100, i))))
      .toDF("src", "dst")
    // ranks arrive as a MATERIALIZED per-round frame (exactly
    // q_pagerank's localCheckpoint discipline) — this also matters for
    // the skew rule: an un-materialized distinct would leave a final
    // aggregate between the shuffle stage and the join's sort, which
    // OptimizeSkewedJoin cannot split through
    val ranks = edges.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("pr"), lit(2L).as("deg"))
      .localCheckpoint(true)

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
      // production defaults are 5× median / 256 MB / 64 MB — scaled to
      // the toy's bytes so the SAME mechanism triggers at test size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the round aggregates on dst right after the src-keyed join, so
      // AQE's "no extra shuffle" heuristic would veto the split even
      // though the agg re-exchanges anyway — production graph rounds
      // run with the force flag for exactly this shape
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // ONE pagerank contribution round, the q_pagerank shape: ranks
      // shuffle-join onto edges by src (merge-pinned — the skew-split
      // mechanism is SMJ's), partial-agg sum by dst
      val contrib = edges.hint("merge")
        .join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      val rows = contrib.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // correctness under the split: the hub receives one half-rank
      // (pr div deg = 500000) from each of its spokes; cold node
      // 200000 from its 100 (i ≡ 0 mod 100) neighbors
      assert(rows(0L) == hubDeg * 500000L, s"hub mass wrong: ${rows(0L)}")
      assert(rows(200000L) == 100L * 500000L, "cold-node mass wrong")

      // the plan actually took the skew path (hub partition was split)
      val plan = contrib.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the contribution join skew-handled:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
