package graft

import org.apache.spark.sql.SparkSession

/** Time ONE declared query in isolation (3 runs, same local[32] shape
  * as Bench) — the iterate-on-a-plan loop without paying the full
  * 139-query bench. Usage: `sbt "runMain graft.TimeOne q_name [sfDir]"`.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = BenchConf(SparkSession.builder().master("local[32]")
      .appName("timeone"), dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench-identical methodology (guide §1.4): noop sink so every
    // column of every row computes (count() lets Catalyst prune most
    // of the plan), cache-clear + GC outside the timing per rep — the
    // r14 count() loop timed a DIFFERENT plan than the battery.
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"run$i $name ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
