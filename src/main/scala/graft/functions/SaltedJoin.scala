package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SURVEY §4.2 / prompt's
  * 100-TB checklist: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handles sort-merge joins automatically at runtime;
  * salting is the static fallback for the cases AQE can't split (e.g. a
  * hot key inside a broadcast-unfriendly aggregation, or pre-AQE
  * stacks). Both are provided:
  *
  *  - [[saltedEquiJoin]]: fact side gets a deterministic salt in
  *    [0, salts); the dim side is exploded ×salts so every (key, salt)
  *    pair still matches. The hot key's rows now spread over `salts`
  *    reducers. Result is row-identical to the unsalted join
  *    (SaltedJoinSpec asserts it).
  *
  *  - [[twoPhaseAgg]]: count/sum-style aggregation over (key, salt)
  *    first (spreads the hot key), then re-aggregated by key — the
  *    classic two-phase combine.
  */
object SaltedJoin {

  /** Deterministic salt from row content — no RNG (rerun-stable). */
  private def salt(c: Column, salts: Int): Column = pmod(xxhash64(c), lit(salts))

  def saltedEquiJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      salts: Int,
      saltBy: String): DataFrame = {
    val salted = fact.withColumn("__salt", salt(col(saltBy), salts))
    val explodedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(explodedDim,
        salted("__salt") === explodedDim("__salt")
          && fact(factKey) === dim(dimKey))
      .drop("__salt")
  }

  def twoPhaseAgg(
      df: DataFrame, key: String, valueCol: String,
      salts: Int, saltBy: String): DataFrame =
    df.withColumn("__salt", salt(col(saltBy), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(key))
      .agg(sum("__cnt").cast("long").as("cnt"), sum("__sum").as("sum"))
}
