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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("timeone")
      // Bench-identical broadcast threshold (r14) — these tools must
      // time the same plans the battery times
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(s"run$i $name rows=$n ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
