package graft

import org.apache.spark.sql.functions._

/** The raw-SQL surface: same engine, same plans, same answers. */
class GraftSqlSpec extends SparkSpec {

  test("a TPC-H-style SQL join+agg matches the DataFrame formulation") {
    val viaSql = GraftSql.run(spark, sfDir,
      """SELECT c_mktsegment, count(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""").collect()
    val viaDf = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), Q.sumDec2(col("o_totalprice")).as("rev"))
      .orderBy("c_mktsegment").collect()
    assert(viaSql.map(_.toSeq).toSeq === viaDf.map(_.toSeq).toSeq)
  }

  test("extension functions are callable from SQL text") {
    val topk = GraftSql.run(spark, sfDir,
      """SELECT l_returnflag,
           graft_topk(l_orderkey, l_extendedprice, 2) AS top2
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    assert(topk.length === 3)
    topk.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.length === 2)
      assert(arr(0).getDouble(1) >= arr(1).getDouble(1), "top-2 not ordered")
    }
    val dot = GraftSql.run(spark, sfDir,
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(dot === 11.0)
  }

  test("portable TPC-H oracle SQL runs on the Spark surface and matches the DataFrame answers") {
    // these oracle texts are ANSI enough to be valid in BOTH DuckDB and
    // Spark SQL — running them through GraftSql proves the SQL surface
    // and the DataFrame formulations are the same engine, not parallel
    // implementations
    for (q <- Seq("q_simple_revenue", "q_large_orders", "q_dormant_customers",
      "q_min_cost_supplier", "q_important_parts", "q_part_type_census",
      "q_excess_share", "q_supplier_wait", "q_pareto_frontier",
      "q_percentile_cont")) {
      val viaSql = GraftSql.run(spark, sfDir, SparkEntry.oracleSql(q))
        .collect()
      val viaDf = SparkEntry.queries(q)(spark, sfDir).collect()
      assert(viaSql.map(_.toSeq).toSeq === viaDf.map(_.toSeq).toSeq,
        s"$q: SQL text and DataFrame disagree")
    }
  }

  test("recursive-CTE BFS runs on the Spark SQL surface and matches the iterative DataFrame loop") {
    // Spark 4 executes WITH RECURSIVE (UNION ALL form) natively — the
    // same hop-bounded BFS the oracle expresses runs on THIS engine,
    // not just DuckDB. Path enumeration (UNION ALL) is exponential in
    // hops on a dense graph (~1.5M length-≤4 paths even at sf0.001 —
    // it trips the engine's 1M-row recursion guard, raised here), so
    // the DataFrame frontier loop stays the production form; this pins
    // the SQL surface's semantics at test SF.
    spark.conf.set("spark.sql.cteRecursionRowLimit", 20000000)
    val viaSql = GraftSql.run(spark, sfDir,
      """WITH RECURSIVE cs AS (
           SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (
           SELECT c AS src, s AS dst FROM cs
           UNION ALL SELECT s AS src, c AS dst FROM cs),
         bfs(node, depth) AS (
           SELECT CAST((SELECT MIN(src) FROM edges) AS BIGINT), 0
           UNION ALL
           SELECT CAST(e.dst AS BIGINT), b.depth + 1
           FROM bfs b JOIN edges e ON e.src = b.node
           WHERE b.depth < 4),
         d AS (SELECT node, MIN(depth) AS depth FROM bfs GROUP BY node)
         SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
         FROM d GROUP BY depth ORDER BY depth""").collect()
    val viaDf = SparkEntry.queries("q_bfs_reach")(spark, sfDir).collect()
    assert(viaSql.map(_.toSeq).toSeq === viaDf.map(_.toSeq).toSeq,
      "recursive SQL BFS and frontier-loop BFS disagree")
  }

  test("SQL text and DataFrame API produce the same physical plan shape") {
    val sqlPlan = GraftSql.run(spark, sfDir,
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 30")
      .queryExecution.executedPlan.toString
    // the filter must push into the scan exactly as the DF API's does
    assert(sqlPlan.contains("PushedFilters") || !sqlPlan.contains("Filter")
      || sqlPlan.contains("Scan parquet"))
    val df = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    assert(df.queryExecution.executedPlan.getClass ===
      GraftSql.run(spark, sfDir,
        "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 30")
        .queryExecution.executedPlan.getClass)
  }
}
