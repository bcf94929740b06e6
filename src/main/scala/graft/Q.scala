package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: a Spark implementation plus (where SQL-expressible)
  * a DuckDB oracle that must hash-match it on the same parquet tables.
  *
  * Determinism contract (SURVEY.md §7.5): every query ends in an ORDER BY
  * over a unique column set; money aggregates go through DECIMAL(18,2) so
  * Spark's and DuckDB's summation order cannot produce FP drift; computed
  * integers are cast to BIGINT on both sides so arrow types line up.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact-decimal view of a stored double money column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-insensitive exact sum of a money column. The sum is computed
    * in DECIMAL (so Spark's and DuckDB's reduction orders cannot drift),
    * then surfaced as DOUBLE — an exact decimal maps to the same nearest
    * double in both engines, and double survives every arrow/pandas
    * conversion a comparer might apply (decimal128 does not).
    */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact average: decimal sum, then one double division (bit-stable in
    * both engines because the operands are identical).
    */
  def avgDec(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)
}
