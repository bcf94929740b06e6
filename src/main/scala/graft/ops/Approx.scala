package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §2.D — engine-default, oracle-exempt).
  *
  * At 100 TB, exact `count(DISTINCT)` is a two-phase expansion whose
  * first phase shuffles every distinct value; the HLL++ sketch shuffles
  * a fixed ~KB buffer per group instead. Deterministic for a fixed
  * input+rsd (the sketch is hash-based, no RNG), but not
  * SQL-oracle-checkable — accuracy bounds are asserted in OpsSpec
  * against the exact counts.
  */
object Approx {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Seq[Q] = Seq(

    Q("q_approx_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.05).as("approx_part"),
          approx_count_distinct(col("l_suppkey"), 0.05).as("approx_supp"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      None),

    // percentile_approx: same trade — bounded sketch vs full sort
    Q("q_approx_quantiles",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      None),

    // ── mergeable sketch rollup (Datasketches HLL) ───────────────────────
    // THE 100-TB pre-aggregation pattern approx_count_distinct can't do:
    // per-segment sketches materialize ONCE (here per (priority, status)
    // cell over o_custkey), then any coarser rollup — per priority, and
    // the grand total — comes from UNIONING the stored binary sketches,
    // never rescanning the fact table. A daily 100-TB pipeline keeps a
    // sketch cube and answers month/year/all-time distincts in
    // milliseconds. Estimates at every level are asserted within HLL
    // error of exact in OpsSpec (oracle-exempt: sketch bytes are
    // implementation-specific).
    Q("q_sketch_rollup",
      (s, dir) => {
        val cells = t(s, dir, "orders")
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"),
            count(lit(1)).as("cnt"))
        val perPriority = cells.groupBy("o_orderpriority")
          .agg(hll_union_agg(col("sk")).as("sk"), sum("cnt").as("cnt"))
          .select(col("o_orderpriority"), lit("ALL").as("o_orderstatus"),
            hll_sketch_estimate(col("sk")).as("est_custs"), col("cnt"))
        val total = cells.groupBy()
          .agg(hll_union_agg(col("sk")).as("sk"), sum("cnt").as("cnt"))
          .select(lit("ALL").as("o_orderpriority"), lit("ALL").as("o_orderstatus"),
            hll_sketch_estimate(col("sk")).as("est_custs"), col("cnt"))
        cells.select(col("o_orderpriority"), col("o_orderstatus"),
            hll_sketch_estimate(col("sk")).as("est_custs"), col("cnt"))
          .unionByName(perPriority).unionByName(total)
          .orderBy("o_orderpriority", "o_orderstatus")
      },
      None)
  )
}
