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

  test("groupValuesAtRanks equals the naive window's rank picks") {
    // the equivalence guard for the histogram-bracketed selection path
    // (q_percentile_disc / q_winsorize / q_ship_latency / q_mad / QTE)
    val li = spark.read.parquet(sfPath("0.01") + "/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber").persist()
    val naiveW = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
    val naive = li
      .select(col("l_returnflag"), col("l_extendedprice"),
        row_number().over(naiveW).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
      .groupBy("l_returnflag")
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === 1, col("l_extendedprice"))).as("lo"),
        max(when(col("rn") === ceil(col("n") * 0.05),
          col("l_extendedprice"))).as("p05"),
        max(when(col("rn") === ceil(col("n") * 0.5),
          col("l_extendedprice"))).as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.9),
          col("l_extendedprice"))).as("p90"),
        max(when(col("rn") === col("n"), col("l_extendedprice")))
          .as("hi"))
    val fast = RangeRank.groupValuesAtRanks(li, Seq("l_returnflag"),
      "l_extendedprice",
      Seq(RangeRank.RankPick("lo", _ => lit(1L)), // rank 1 = min
        RangeRank.RankPick("p05", n => ceil(n * 0.05)),
        RangeRank.RankPick("p50", n => ceil(n * 0.5)),
        RangeRank.RankPick("p90", n => ceil(n * 0.9)),
        RangeRank.RankPick("hi", n => n))) // rank n = max
      .select("l_returnflag", "n", "lo", "p05", "p50", "p90", "hi")
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty,
      "histogram value-at-rank diverged from the naive window picks")
    li.unpersist()
  }

  test("groupValuesAtRanks: second pass over a derived dev frame " +
    "equals the naive window (the q_mad shape)") {
    // formerly MadDebugSpec: the MAD second selection runs over a frame
    // DERIVED from the first pick (dev = |x − med|) — guard that the
    // derived-input path stays equivalent too
    val li = spark.read.parquet(sfPath("0.01") + "/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").persist()
    val med = RangeRank.groupValuesAtRanks(li, Seq("l_returnflag"),
      "l_extendedprice",
      Seq(RangeRank.RankPick("med", n => ceil(n * 0.5))))
      .select(col("l_returnflag").as("m_flag"), col("med"))
    val dev = li.join(broadcast(med),
        col("l_returnflag") === col("m_flag"))
      .select(col("l_returnflag"),
        abs(col("l_extendedprice") - col("med")).as("dev")).persist()
    val naiveW = Window.partitionBy("l_returnflag").orderBy(col("dev"))
    val naive = dev
      .select(col("l_returnflag"), col("dev"),
        row_number().over(naiveW).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
      .groupBy("l_returnflag")
      .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("dev")))
        .as("mad"))
    val fast = RangeRank.groupValuesAtRanks(dev, Seq("l_returnflag"),
      "dev", Seq(RangeRank.RankPick("mad", n => ceil(n * 0.5))))
      .select("l_returnflag", "mad")
    assert(naive.exceptAll(fast).isEmpty && fast.exceptAll(naive).isEmpty,
      "derived-frame value-at-rank diverged from the naive window")
    li.unpersist(); dev.unpersist()
  }

  test("groupValuesAtRanks sumName: S(k) equals the naive window prefix") {
    // the exact prefix-sum-at-rank primitive (trimmed/winsorized sums)
    val li = spark.read.parquet(sfPath("0.01") + "/lineitem.parquet")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q")).persist()
    val naiveW = Window.partitionBy("l_returnflag").orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val rnW = Window.partitionBy("l_returnflag").orderBy(col("q"))
    val naive = li
      .select(col("l_returnflag"), sum(col("q")).over(naiveW).as("sk"),
        row_number().over(rnW).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("l_returnflag")).as("n"))
      .groupBy("l_returnflag")
      .agg(
        max(when(col("rn") === expr("n div 10"), col("sk"))).as("s_lo"),
        max(when(col("rn") === ceil(col("n") * 0.5), col("sk"))).as("s_med"))
    // naive prefix at rank k is tie-DEPENDENT only in which row carries
    // rank k, not in the sum of the k smallest (equal values commute)
    val fast = RangeRank.groupValuesAtRanks(li, Seq("l_returnflag"), "q",
      Seq(RangeRank.RankPick("v_lo", n => expr("n div 10"),
          sumName = Some("s_lo")),
        RangeRank.RankPick("v_med", n => ceil(n * 0.5),
          sumName = Some("s_med"))))
      .select(col("l_returnflag"), col("s_lo").cast("long").as("s_lo"),
        col("s_med").cast("long").as("s_med"))
    val naiveL = naive.select(col("l_returnflag"),
      col("s_lo").cast("long").as("s_lo"),
      col("s_med").cast("long").as("s_med"))
    assert(naiveL.exceptAll(fast).isEmpty && fast.exceptAll(naiveL).isEmpty,
      "prefix-sum-at-rank diverged from the naive running sum")
    li.unpersist()
  }

  test("groupValuesAtRanks: k = 0 yields NULL pick and NULL S(0)") {
    // the documented degenerate contract (q_trimmed_stats coalesces
    // S(0) to 0 when n div 10 = 0): a zero rank target matches no
    // bracket, so both the member pick and the prefix sum come back
    // null rather than a wrong row
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 5L), ("a", 9L)).toDF("g", "v").persist()
    val out = RangeRank.groupValuesAtRanks(df, Seq("g"), "v",
      Seq(RangeRank.RankPick("v0", n => n * 0, sumName = Some("s0")),
        RangeRank.RankPick("v2", n => n - 1, sumName = Some("s2"))))
      .collect()(0)
    assert(out.isNullAt(out.fieldIndex("v0"))
      && out.isNullAt(out.fieldIndex("s0")))
    assert(out.getLong(out.fieldIndex("v2")) === 5L)
    assert(out.getDecimal(out.fieldIndex("s2")).longValue === 8L)
    df.unpersist()
  }

  test("groupValuesAtRanks: constant groups and coinciding targets") {
    import spark.implicits._
    // group a: all-equal values (mn == mx bucket collapse); group b:
    // n = 3 where ceil(n·0.5) = ceil(n·0.66) = 2 (coinciding targets)
    val df = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("a", 7L),
      ("b", 1L), ("b", 5L), ("b", 9L)).toDF("g", "v").persist()
    val out = RangeRank.groupValuesAtRanks(df, Seq("g"), "v",
      Seq(RangeRank.RankPick("k1", n => ceil(n * 0.5)),
        RangeRank.RankPick("k2", n => ceil(n * 0.66))))
      .orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(out(0).getLong(2) === 7L && out(0).getLong(3) === 7L)
    assert(out(1).getLong(2) === 5L && out(1).getLong(3) === 5L)
    df.unpersist()
  }

  test("groupValuesAtRanks: adversarial skew engages the second " +
      "bracketing level and stays byte-identical") {
    import spark.implicits._
    // the r8 ADVICE shape: one extreme outlier stretches [mn, mx] so
    // EVERY other row collapses into level-1 bucket 0 — without
    // refinement the resolve pass would census ~all distinct group
    // values in one cell
    val rows = (0 until 5000).map(i => ("a", (i * 7 % 1000).toLong)) ++
      Seq(("a", 1000000000000L)) ++
      (0 until 3000).map(i => ("b", (i * 13 % 700).toLong)) ++
      Seq(("b", 999999999999L))
    val df = rows.toDF("g", "v").repartition(8).persist()
    val naiveW = Window.partitionBy("g").orderBy(col("v"))
    val naive = df
      .select(col("g"), col("v"),
        row_number().over(naiveW).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy("g")).as("n"),
        coalesce(sum(col("v").cast("long")).over(naiveW.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)).as("ps"))
      .groupBy("g")
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === ceil(col("n") * 0.5), col("v"))).as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.5), col("ps") + col("v")))
          .as("s50"),
        max(when(col("rn") === ceil(col("n") * 0.9), col("v"))).as("p90"))
    val picks = Seq(
      RangeRank.RankPick("p50", n => ceil(n * 0.5), Some("s50")),
      RangeRank.RankPick("p90", n => ceil(n * 0.9)))
    // refined path (threshold forces level 2 on this input) and the
    // default single-level path must agree with the naive window AND
    // each other — selection is bucketing-invariant
    val refined = RangeRank.groupValuesAtRanks(df, Seq("g"), "v", picks,
        refineCellRows = 100L)
    assert(refined.queryExecution.analyzed.toString.contains("__b2"),
      "skew probe did not engage the second bracketing level")
    val onePass = RangeRank.groupValuesAtRanks(df, Seq("g"), "v", picks)
    assert(!onePass.queryExecution.analyzed.toString.contains("__b2"),
      "second level engaged below the cell-population threshold")
    for (fast <- Seq(refined, onePass)) {
      val out = fast.select(col("g"), col("n"), col("p50"),
        col("s50").cast("long").as("s50"), col("p90"))
      assert(naive.exceptAll(out).isEmpty && out.exceptAll(naive).isEmpty,
        "skew-refined value-at-rank diverged from the naive window")
    }
    df.unpersist()
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

  // ── round-12 law: the three selection machines agree bit-for-bit ────
  // weighted-census groupValuesAtRanks and censusValuesAtRanks must
  // reproduce the raw-row machinery exactly — value-at-rank AND
  // prefix-sum-at-rank — on a tie-heavy skewed input. This is the
  // equivalence the shared-census artifact consumers rely on.
  test("weighted-census selection equals raw-row selection (both variants)") {
    import spark.implicits._
    val raw = (1 to 500).flatMap { i =>
      Seq.fill(i % 7 + 1)((s"g${i % 3}", (i.toLong * i) % 97))
    }.toDF("g", "v").persist()
    val census = raw.groupBy("g", "v")
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(true)
    val picks = Seq(
      RangeRank.RankPick("p25", n => ceil(n * 0.25)),
      RangeRank.RankPick("med", n => expr("(n + 1) div 2"),
        sumName = Some("s_med")),
      RangeRank.RankPick("p90", n => ceil(n * 0.9)))
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] = df
      .select(col("g"), col("n"), col("p25"), col("med"),
        col("s_med").cast("decimal(38,0)"), col("p90"))
      .collect().map(_.toString).toSet
    val rawSel = canon(RangeRank.groupValuesAtRanks(
      raw, Seq("g"), "v", picks))
    val weighted = canon(RangeRank.groupValuesAtRanks(
      census, Seq("g"), "v", picks, weightCol = Some("c")))
    val prefix = canon(RangeRank.censusValuesAtRanks(
      census, Seq("g"), "v", "c", picks))
    raw.unpersist()
    assert(rawSel.nonEmpty && weighted === rawSel,
      "weighted histogram selection diverged from raw rows")
    assert(prefix === rawSel,
      "census prefix selection diverged from raw rows")
  }
  // ── round-13 law: the FOURTH selection machine agrees too ───────────
  // pinnedValuesAtRanks over a census whose exclusive prefixes are
  // ALREADY attached (the pinned RANKED artifact shape) must reproduce
  // censusValuesAtRanks bit-for-bit — value-at-rank AND
  // prefix-sum-at-rank — including the n = Σ-multiplicity contract
  // (ranked()'s nName counts CENSUS ROWS, not the multiset; the
  // round-13 artifact builders join their own totals — the bug the
  // mid-round gate caught on q_percentile_disc and friends).
  test("pinnedValuesAtRanks equals censusValuesAtRanks on a prefixed census") {
    import spark.implicits._
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val raw = (1 to 400).flatMap { i =>
      Seq.fill(i % 5 + 1)((s"g${i % 4}", (i.toLong * 31) % 83))
    }.toDF("g", "v")
    val census = raw.groupBy("g", "v")
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(true)
    val picks = Seq(
      RangeRank.RankPick("p25", n => ceil(n * 0.25)),
      RangeRank.RankPick("med", n => expr("(n + 1) div 2"),
        sumName = Some("s_med")),
      RangeRank.RankPick("p90", n => ceil(n * 0.9)))
    // attach the exclusive prefixes + multiset totals by hand — the
    // exact artifact-builder recipe from Censuses
    val tot = census.groupBy(col("g").as("tg"))
      .agg(sum(col("c")).cast("long").as("nn"))
    val art = RangeRank.ranked(census, Seq("g"), Seq(col("v")),
        rnName = "__rn", nName = None,
        prefixSums = Seq(RangeRank.PrefixSum(col("c"), "off"),
          RangeRank.PrefixSum(col("v").cast(dec38) * col("c"), "vs")))
      .join(broadcast(tot), col("g") === col("tg"))
      .select(col("g"), col("v"), col("c").cast("long").as("c"),
        col("off").cast("long").as("off"),
        col("vs").cast(dec38).as("vs"), col("nn"))
      .localCheckpoint(true)
    def canon2(df: org.apache.spark.sql.DataFrame): Set[String] = df
      .select(col("g"), col("n"), col("p25"), col("med"),
        col("s_med").cast("decimal(38,0)"), col("p90"))
      .collect().map(_.toString).toSet
    val viaCensus = canon2(RangeRank.censusValuesAtRanks(
      census, Seq("g"), "v", "c", picks))
    val viaPinned = canon2(RangeRank.pinnedValuesAtRanks(
      art, Seq("g"), "v", "c", "off", "nn", picks, vsCol = Some("vs")))
    assert(viaCensus.nonEmpty && viaPinned === viaCensus,
      "pinned-prefix selection diverged from census selection")
  }
}
