package graft

import org.apache.spark.sql.SparkSession

/** Same-session disposition run for driver-session per-query spikes
  * (r10 verdict, What's wrong #3): the flagged queries and an equal
  * number of stable controls are timed INTERLEAVED (so tenancy drift
  * hits both groups equally), min-of-N per query, Bench-identical
  * execution (clearCache + gc outside the timing, noop sink).
  *
  * Reading: the spike claim is "driver session measured ~2-3× the
  * builder-close time on an unchanged binary". If this run reproduces
  * the CLOSE-map times (and the controls sit at their battery values),
  * the driver delta was co-tenancy; if a flagged query reproduces its
  * DRIVER time while controls hold, it's code and needs a fix.
  *
  * Usage: `sbt "runMain graft.AbSpike [sfDir] [reps] [q1,q2,...]"`.
  */
object AbSpike {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      // flagged (driver/close ratio): 3.0×, 2.85×, 2.11×
      "q_multisource_depth", "q_norm_profile", "q_novelty",
      // controls: same cost band, driver/close ≈ battery median
      "q_groupby_sum", "q_pricing_summary", "q_ks_drift"))
    val spark = BenchConf(SparkSession.builder().master("local[32]")
      .appName("ab-spike"), dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())

    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to reps; q <- names) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      acc(q) = dt :: acc(q)
      println(f"rep$r $q%-22s $dt%.2fs")
    }
    println("== min-of-" + reps + " ==")
    names.foreach(q => println(f"$q%-22s ${acc(q).min}%.2f"))
    spark.stop()
  }
}
