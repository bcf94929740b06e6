package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RangeRank must reproduce the naive few-group window EXACTLY — same rn,
  * same n, same prefix sums — while planning the sort as P range slices
  * instead of one task per group.
  */
class RangeRankSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("ranked() equals the naive single-task window bit-for-bit") {
    val naiveW = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val naive = lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        row_number().over(naiveW).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))

    val fast = RangeRank.ranked(
      lineitem.select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice"),
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "rn", "n")

    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty,
      "range-partitioned rank diverged from the naive window")
  }

  test("prefix sums equal the naive exclusive running sum") {
    val naiveW = Window.partitionBy("l_returnflag")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        coalesce(sum(col("l_quantity").cast("long")).over(naiveW), lit(0L))
          .as("run_qty"))

    val fast = RangeRank.ranked(
      lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_quantity").cast("long").as("q")),
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("l_orderkey"), col("l_linenumber")),
      nName = None,
      prefixSums = Seq(RangeRank.PrefixSum(col("q"), "run_qty")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("run_qty").cast("long").as("run_qty"))

    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty,
      "range-partitioned prefix sum diverged from the naive window")
  }

  test("no window in the plan partitions by the bare group key") {
    // the point of the utility: every data-sized window carries the range
    // partition id in its partition spec; the census windows (≤ P·|k|
    // rows) sit above an Aggregate, never directly over the scan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = RangeRank.ranked(
      lineitem.select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice"),
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")))
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    for (w <- windows) {
      val overCensus = w.child.collectFirst { case a: Aggregate => a }.nonEmpty
      val hasPid = w.partitionSpec.exists(_.toString.contains("__rr_pid"))
      assert(hasPid || overCensus,
        s"data-sized window partitioned only by the group key:\n$w")
    }
  }

  test("the range exchange is planned once (ReuseExchange fires)") {
    // correctness depends on the census and the rank pass observing the
    // SAME physical range partitioning; the reused exchange guarantees it
    val df = RangeRank.ranked(
      lineitem.select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice"),
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")))
    df.collect() // AQE finalizes reuse at execution time
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange")
      || df.queryExecution.executedPlan.toString.contains("TableCacheQueryStage"),
      "census and rank subtrees planned independent range exchanges")
  }
}
