package graft.ops

import graft.Tables
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared VALUE-CENSUS artifacts — the sufficient statistics behind the
  * rank/dispersion/two-sample battery, built ONCE per (session, dir)
  * and localCheckpoint-pinned (the Artifacts train-once contract, same
  * as the graph edge table and the wedge/Sen/BLEU cores).
  *
  * The shape every consumer shares: collapse a fact table to its exact
  * (group, value) count census — one scan, one shuffle — then finish
  * rank statistics on census rows only. Round 11 proved the pattern on
  * the two-sample family (ModelEval.ansariCounts); round 12 hoists the
  * census itself into an artifact so the N queries that start from the
  * SAME census (J-T, Cuzick, Gini mean difference, trimmed/winsorized
  * means, quartile dispersion, double-MAD, the seven ansariCounts
  * finishes) pay the corpus scan once per session instead of once per
  * query. At 100 TB the census is bounded by the value domain (cents
  * of a bounded price range — ~10⁷ rows), so the pinned artifact is
  * executor-memory-safe at any corpus size.
  */
object Censuses {

  private val priorityCentsMemo = Artifacts.memo[DataFrame] {
    case (_, d) => d.unpersist(false); ()
  }

  /** The (o_orderpriority, total-price cents) count census — exact,
    * bounded by |priorities| × |distinct cents|. Consumers derive their
    * own view row-locally: urgent-vs-rest (c1, c2) pooled columns for
    * the two-sample family, g = leading priority digit for the ordered
    * trend tests, the ungrouped (v, c) census for the order-value
    * dispersion battery.
    */
  def priorityCents(s: SparkSession, dir: String): DataFrame =
    priorityCentsMemo.computeIfAbsent((s, dir), _ =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("p"),
          (dec2(col("o_totalprice")) * 100).cast("long").as("v"))
        .groupBy("p", "v")
        .agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint(true))

  /** Urgent-vs-rest pooled view of [[priorityCents]] — the EXACT frame
    * `ModelEval.ansariCounts(orders)` computes from the raw corpus (the
    * streaming twin keeps building it from the live stream; batch
    * queries read it off the shared artifact).
    */
  def ansariCountsOf(s: SparkSession, dir: String): DataFrame =
    priorityCents(s, dir)
      .groupBy("v")
      .agg(sum(when(col("p").isin("1-URGENT", "2-HIGH"), col("c"))
          .otherwise(0L)).cast("long").as("c1"),
        sum(when(col("p").isin("1-URGENT", "2-HIGH"), lit(0L))
          .otherwise(col("c"))).cast("long").as("c2"))

  private val orderCentsMemo = Artifacts.memo[DataFrame] {
    case (_, d) => d.unpersist(false); ()
  }

  /** Ungrouped (v, c) order-value census — [[priorityCents]] summed
    * over the priority alphabet, pinned separately because its
    * consumers (the order-value dispersion battery) read it several
    * times per query.
    */
  def orderCents(s: SparkSession, dir: String): DataFrame =
    orderCentsMemo.computeIfAbsent((s, dir), _ =>
      priorityCents(s, dir)
        .groupBy("v")
        .agg(sum(col("c")).cast("long").as("c"))
        .localCheckpoint(true))

  private val scoreCensusMemo = Artifacts.memo[DataFrame] {
    case (_, d) => d.unpersist(false); ()
  }

  /** Pinned per-score census over events — the ranking-quality
    * battery's sufficient statistic ([[ModelEval.scoreCensus]]): the
    * AUC / PR-curve / KS / DeLong finishes all read this one artifact;
    * the streaming twin builds the identical frame as Complete-mode
    * state from the live stream.
    */
  def scoreCensus(s: SparkSession, dir: String): DataFrame =
    scoreCensusMemo.computeIfAbsent((s, dir), _ =>
      ModelEval.scoreCensus(Tables.load(s, dir, "events"))
        .localCheckpoint(true))

  private val ksCountsMemo = Artifacts.memo[DataFrame] {
    case (_, d) => d.unpersist(false); ()
  }

  /** Pinned (source, n_chars) document-length census — the drift
    * battery's sufficient statistic ([[Curation.ksCounts]]): the KS /
    * Kuiper / CvM / Wasserstein drift lenses all read this one
    * artifact (the streaming twin builds the identical frame live).
    */
  def ksCounts(s: SparkSession, dir: String): DataFrame =
    ksCountsMemo.computeIfAbsent((s, dir), _ =>
      Curation.ksCounts(Tables.load(s, dir, "documents"))
        .select(col("source"), col("v"), col("c").cast("long").as("c"))
        .localCheckpoint(true))

  private val flagPriceMemo = Artifacts.memo[DataFrame] {
    case (_, d) => d.unpersist(false); ()
  }

  /** The (l_returnflag, l_extendedprice) count census over lineitem —
    * extended prices are exact cent-valued doubles, so grouping on the
    * double is exact. Bounded by |flags| × |distinct prices| (≤ parts ×
    * 50 quantities at any corpus size). Feeds the robust-dispersion
    * battery (MAD) whose selections are value-at-rank picks — census
    * multiplicity replaces raw-row rank counting exactly.
    */
  def flagPrice(s: SparkSession, dir: String): DataFrame =
    flagPriceMemo.computeIfAbsent((s, dir), _ =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("f"),
          col("l_extendedprice").as("v"))
        .groupBy("f", "v")
        .agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint(true))
}
