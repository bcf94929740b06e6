package graft

import org.apache.spark.sql.SparkSession

/** Same-session paired A/B for the RangeRank consumer family (r9
  * verdict, What's wrong #1): times each query under interleaved
  * configurations so tenancy drift hits all arms equally, min-of-N per
  * arm, Bench-identical execution (clearCache + gc outside the timing,
  * noop sink).
  *
  * Arms:
  *   base    — r9 HEAD behavior: probe action on, 32-partition tiny
  *             census frames (-Dgraft.rr.c1=0)
  *   noprobe — skew probe action skipped (-Dgraft.rr.refine=MaxValue),
  *             frames still 32-partition
  *   c1      — single-partition census frames + 1-task collect probe
  *             (the candidate fix; default code path)
  *
  * Usage: `sbt "runMain graft.AbRangeRank [sfDir] [reps] [q1,q2,...]"`.
  */
object AbRangeRank {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "q_ship_latency", "q_kde_profile", "q_trimmed_stats",
      "q_percentile_disc"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ab-rangerank").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())

    val arms = Seq(
      ("base", () => { sys.props("graft.rr.c1") = "0"
        sys.props.remove("graft.rr.refine"); () }),
      ("noprobe", () => { sys.props("graft.rr.c1") = "0"
        sys.props("graft.rr.refine") = Long.MaxValue.toString; () }),
      ("c1", () => { sys.props.remove("graft.rr.c1")
        sys.props.remove("graft.rr.refine"); () }))
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; (arm, set) <- arms; q <- names) {
      set()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      acc((q, arm)) = dt :: acc((q, arm))
      println(f"rep$r $arm%-8s $q%-22s $dt%.2fs")
    }
    sys.props.remove("graft.rr.c1"); sys.props.remove("graft.rr.refine")
    println("== min-of-" + reps + " per arm ==")
    for (q <- names) {
      val mins = arms.map { case (a, _) => a -> acc((q, a)).min }
      println(f"$q%-22s " + mins.map { case (a, v) =>
        f"$a=$v%.2f" }.mkString("  "))
    }
    spark.stop()
  }
}
