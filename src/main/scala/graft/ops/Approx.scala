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
      None)
  )
}
