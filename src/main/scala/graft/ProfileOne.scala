package graft

import org.apache.spark.sql.SparkSession

/** Break ONE query's Bench-style cost into its phases (r9 verdict item
  * 1a: "profile one mid-pack query's driver-session breakdown"):
  * plan build, analysis, physical planning, first execution (codegen +
  * run), second execution (Bench's rep-2: codegen cache warm), and the
  * pure single-table scan floors for context.
  *
  * Usage: `sbt "runMain graft.ProfileOne q_name [sfDir]"`.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = BenchConf(SparkSession.builder().master("local[32]")
      .appName("profileone"), dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    def ms[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }
    for (rep <- 1 to 2) {
      println(s"-- rep $rep --")
      spark.catalog.clearCache()
      System.gc()
      val df = ms("build") { SparkEntry.queries(name)(spark, dir) }
      ms("analyze") { df.queryExecution.assertAnalyzed() }
      ms("optimize") { df.queryExecution.optimizedPlan }
      ms("plan") { df.queryExecution.executedPlan }
      ms("execute") { df.write.format("noop").mode("overwrite").save() }
    }
    println("-- scan floors (noop write of the raw table) --")
    for (t <- Seq("lineitem", "orders", "events", "documents")) {
      val df = Tables.load(spark, dir, t)
      ms(s"scan:$t") { df.write.format("noop").mode("overwrite").save() }
      ms(s"scan2:$t") { df.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
