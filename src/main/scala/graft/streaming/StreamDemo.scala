package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.nio.file.Files

/** Demo client: replay the `events` table through a file-source stream
  * (one parquet batch per day, Trigger.AvailableNow) into the tumbling
  * event-time window aggregation, and print the result.
  *
  * Run: `sbt "runMain graft.streaming.StreamDemo [sfDir]"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage per-day batch files (arrival order = event-time order)
    val dir = Files.createTempDirectory("graft-stream-demo").toString
    Tables.load(spark, sfDir, "events")
      .withColumn("day", dayofmonth(col("ts")))
      .repartition(col("day"))
      .write.partitionBy("day").mode("overwrite").parquet(s"$dir/staging")
    val out = new java.io.File(s"$dir/in"); out.mkdirs()
    new java.io.File(s"$dir/staging").listFiles()
      .filter(_.getName.startsWith("day=")).sortBy(_.getName).zipWithIndex
      .foreach { case (d, i) =>
        d.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
          case (f, j) =>
            Files.copy(f.toPath, new java.io.File(out, f"batch$i%03d-$j.parquet").toPath)
        }
      }

    val result = StreamingOps.runToMemory(
      StreamingOps.tumbling(StreamingOps.readEventStream(spark, s"$dir/in")),
      "demo_tumble", OutputMode.Complete())
    println(s"windows: ${result.count()}")
    result.orderBy("ws", "event_type").show(12, truncate = false)
    spark.stop()
  }
}
