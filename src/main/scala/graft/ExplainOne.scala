package graft

import org.apache.spark.sql.SparkSession

/** Print ONE declared query's optimized + formatted physical plan —
  * the iterate-on-a-plan companion to [[TimeOne]] (which times it).
  * Usage: `sbt "runMain graft.ExplainOne q_name [sfDir]"`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .appName("explainone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"== $name optimized ==")
    println(df.queryExecution.optimizedPlan.toString)
    println(s"== $name formatted ==")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
