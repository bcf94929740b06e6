package graft.ops

import graft.{GraftSql, Q}

/** The raw-SQL entry point ([[graft.GraftSql]]) as a gated query: the
  * engine's second API surface. The SQL text below is dialect-neutral
  * ANSI — the SAME string is the Spark query (via `GraftSql.run`, i.e.
  * `spark.sql` over the registered table views) and the DuckDB oracle,
  * so the gate proves text-in ≡ DataFrame-in end-to-end: one Catalyst
  * pipeline, identical pushdown/pruning (PLANS.md's properties hold for
  * SQL users), identical answers.
  *
  * The reference has no query language at all (its "query" is a C++
  * callback pair, reference `MapReduceClient.h:54-64`); SQL-in is the
  * north-star surface a warehouse user expects.
  */
object SqlApi {

  /** Q10-flavored returned-revenue rollup: 3 joins, a pushed filter,
    * decimal-exact money aggregation — enough plan surface to prove the
    * SQL path is the same engine, small enough to stay dialect-neutral.
    */
  private val returnedRevenueSql =
    """SELECT n_name, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Window-function coverage for the SQL surface: top-2 orders per
    * customer. The window partitions by a SCALING key (o_custkey), so
    * per-partition work is constant and parallelism grows with the
    * data — the shape a few-group partition key would violate (that
    * family rides RangeRank; see PlanGuardSpec).
    */
  private val topOrdersSql =
    """SELECT o_custkey, o_orderkey, rk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders) r
      |WHERE rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_sql_surface",
      (s, dir) => GraftSql.run(s, dir, returnedRevenueSql),
      Some(returnedRevenueSql)),
    Q("q_sql_window",
      (s, dir) => GraftSql.run(s, dir, topOrdersSql),
      Some(topOrdersSql))
  )
}
