package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-14 measurement harness (guide §1): split one query's wall time
  * into plan-side (analysis+optimization+codegen trigger) and
  * execution, and count jobs / stages / tasks / summed task runtime so
  * the per-query FIXED overhead (driver scheduling, tiny tasks) is
  * visible separately from data work. Bench-identical session config.
  *
  * Usage: `sbt "runMain graft.Profile q1,q2,... [sfDir] [reps]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val qs: Seq[String] =
      if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(',').map(_.trim).toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchConf(SparkSession.builder().master(s"local[$cpus]"),
      dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null)
          taskNs.addAndGet(e.taskMetrics.executorRunTime * 1000000L)
      }
    })
    // warmup identical to Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    println("query,rep,plan_s,exec_s,total_s,jobs,stages,tasks,tasktime_s")
    qs.foreach { q =>
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        System.gc()
        jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0L)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        df.queryExecution.executedPlan // force analysis+optimization+physical planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        // listener bus is async; give it a beat before reading counters
        Thread.sleep(50)
        println(f"$q,$rep,${(t1 - t0) / 1e9}%.3f,${(t2 - t1) / 1e9}%.3f," +
          f"${(t2 - t0) / 1e9}%.3f,${jobs.get},${stages.get},${tasks.get}," +
          f"${taskNs.get / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
