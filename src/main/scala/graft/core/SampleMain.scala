package graft.core

import org.apache.spark.sql.SparkSession

/** Demo client program — the reference's `SampleClient.cpp:69-108`
  * experience on the Spark runtime: start a char-count job, poll
  * stage/percentage while it runs, print sorted per-char totals.
  *
  * Run: `sbt "runMain graft.core.SampleMain"`.
  */
object SampleMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-sample-client")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val strings = Seq(
      "This string is full of characters",
      "Multithreading is awesome",
      "race conditions are bad")
    val input = spark.sparkContext.parallelize(strings.map(s => (null: Null, s)), 3)

    val handle = MapReduceJob.start(spark, input, new Clients.CharCount, 4)
    while (!handle.isDone) {
      val st = handle.state
      println(f"stage ${st.stage}%-9s ${st.percentage}%5.1f%%")
      Thread.sleep(50)
    }
    val out = handle.waitForJob()
    println(s"final state: ${handle.state}")
    out.sortBy(_._1).foreach { case (c, n) => println(s"The character $c appeared $n times") }
    spark.stop()
  }
}
