package graft

import org.apache.spark.sql.SparkSession

/** Quantify the per-query FIXED overhead share of the battery (r13
  * verdict item 2: the close floor ≈ 626 × ~0.48 s of analysis + job
  * overhead at sf0.1 breaches the 2× line under driver-session drift
  * regardless of per-query wins — so measure WHICH session-level knobs
  * move the fixed cost before touching any per-query plan).
  *
  * Times one pick list Bench-style (clearCache + GC outside the
  * timing, noop sink, min-of-2) under a sweep of runtime-settable
  * session configs — AQE on/off is the headline comparison: AQE's
  * per-exchange re-optimization splits every tiny census query into
  * extra jobs with driver-side replanning between them, pure overhead
  * at sf0.1 scale, while its runtime wins (skew splitting, partition
  * coalescing ahead of big shuffles) only matter at real volume.
  *
  * Usage: `sbt "runMain graft.OverheadProbe [sfDir] [q1,q2,...]"`.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val picks: Seq[String] =
      if (args.length > 1 && args(1) == "all")
        SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args(1).split(',').toSeq
      else Seq(
        // cheap census/agg shapes — the 418-query 0.3–0.7 s floor
        "q_mode", "q_groupby_sum", "q_agg_distinct", "q_filter_pred",
        "q_argmax", "q_gini", "q_hhi", "q_mad", "q_moments",
        "q_p_chart", "q_rosenbluth_index", "q_langid_accuracy",
        "q_growth_accounting", "q_diebold_mariano", "q_autocorr",
        // mid-pack joins/windows
        "q_join_inner", "q_join_broadcast", "q_window_rank",
        "q_sessionize", "q_retention",
        // heavies that AQE could plausibly HELP
        "q_pagerank", "q_hits", "q_brand_affinity", "q_ipf_raking",
        "q_conover_squared_ranks")
    val builder = BenchConf(SparkSession.builder().master("local[32]"), dir)
    // context-level (non-runtime-settable) conf experiments, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.shuffle.compress=false"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())

    def timed(name: String): Double = {
      def one(): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[probe] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      math.min(one(), one())
    }

    // configs are swept INTERLEAVED per query (config A then B then A'
    // on the same query back-to-back) so host drift between sweeps
    // cannot masquerade as a config effect
    def reset(): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (10L * 1024 * 1024).toString)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        "true")
    }
    val modes: Seq[(String, () => Unit)] = Seq(
      "aqe_on" -> (() => { reset() }),
      "aqe_off" -> (() => {
        reset()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      }),
      "aqe_on_nocoalesce" -> (() => {
        reset()
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", "false")
      }),
      // static broadcast threshold raised: direct-scan sides under
      // 64 MB broadcast at PLAN time — no exchange materialization
      // needed before AQE's runtime conversion can notice
      "abt64" -> (() => {
        reset()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64L * 1024 * 1024).toString)
      }),
      "abt64_aqe_off" -> (() => {
        reset()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64L * 1024 * 1024).toString)
      })
    ).filter { case (l, _) =>
      args.length <= 2 || args(2).split(',').contains(l)
    }
    val acc = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    val per = scala.collection.mutable.Map[(String, String), Double]()
    for (q <- picks; (label, set) <- modes) {
      set()
      val t = timed(q)
      acc(label) += t
      per((q, label)) = t
    }
    println("query                          " +
      modes.map { case (l, _) => f"$l%18s" }.mkString)
    for (q <- picks)
      println(f"$q%-30s" +
        modes.map { case (l, _) => f"${per((q, l))}%18.3f" }.mkString)
    println(f"TOTAL${""}%-25s" +
      modes.map { case (l, _) => f"${acc(l)}%18.3f" }.mkString)
    spark.stop()
  }
}
