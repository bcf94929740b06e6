package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchConf(SparkSession.builder().master("local[4]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- args) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
