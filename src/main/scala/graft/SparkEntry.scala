package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query over the
  * driver parquet tables, with a DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  /** All declared queries, in SURVEY §2 order. */
  def allQ: Seq[Q] =
    ops.Relational.queries ++ ops.EventTime.queries ++ ops.Dedup.queries ++
      ops.TextOps.queries ++ ops.VectorOps.queries ++ ops.Multimodal.queries ++
      ops.Approx.queries ++ ops.Curation.queries ++ ops.Graph.queries ++
      ops.Layout.queries ++ ops.ModelEval.queries ++ ops.SqlApi.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_charcount = the reference's CounterClient (SampleClient.cpp:32-66)
    * re-expressed as explode + partial/final aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_charcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. The driver
    * invokes these with its own SparkSession (no extensions config), so
    * each run first idempotently registers the engine's custom functions.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        plans.GraftExtensions.ensureRegistered(s)
        q.run(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse Scala triple-quote indentation to single-line SQL. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
