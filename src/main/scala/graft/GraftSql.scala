package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL entry point: the whole table surface registered as temp views
  * plus the graft extension functions (`graft_dot`, `graft_topk`,
  * `graft_minhash`, ...), so a user can drive the engine with ANSI SQL
  * instead of the DataFrame API. Everything lands in the same Catalyst
  * pipeline as the declared queries — `spark.sql` text and DataFrame
  * calls produce identical plans, so every pushdown/pruning/broadcast
  * property PLANS.md documents holds for SQL users too.
  */
object GraftSql {

  /** Register the sf tables + extension functions on this session
    * (idempotent) and return the session for chaining.
    */
  def attach(spark: SparkSession, sfDir: String): SparkSession = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    Tables.registerAll(spark, sfDir)
    spark
  }

  /** Run one SQL statement against the attached tables. */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    attach(spark, sfDir)
    spark.sql(sql)
  }
}
