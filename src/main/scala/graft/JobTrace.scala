package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Round-14 measurement harness (guide §1/§7): run ONE query under the
  * Bench session shape and print every Spark job it submits — duration,
  * stage count, task count, and the job group/description AQE attaches —
  * so the per-query job/stage structure is visible without the UI.
  * Two reps: rep2 separates codegen/warm-up costs from steady state.
  *
  * Usage: sbt "runMain graft.JobTrace <query> [sfDir]".
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchConf(SparkSession.builder().master(s"local[$cpus]"),
      dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // no per-job task counter: nothing updated it (r14 ADVICE dead
    // field) — per-stage task counts below carry that evidence
    case class J(t0: Long, var stages: Int = 0, var desc: String = "")
    val live = TrieMap.empty[Int, J]
    val done = TrieMap.empty[Int, (Double, Int, String)]
    // stageId -> (duration, tasks, summed task runtime, summed GC, name)
    val stg = TrieMap.empty[Int, (Double, Int, Double, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        live.put(e.jobId, J(System.nanoTime(), e.stageIds.size, d))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val dur = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        val run = Option(i.taskMetrics)
          .map(_.executorRunTime / 1e3).getOrElse(-1.0)
        val gc = Option(i.taskMetrics)
          .map(_.jvmGCTime / 1e3).getOrElse(-1.0)
        // first line of the call-site details names the operator site
        val site = i.details.linesIterator.toSeq.headOption.getOrElse("")
        stg.put(i.stageId, (dur, i.numTasks, run, gc, i.name.take(40) +
          " @ " + site.take(60)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        live.remove(e.jobId).foreach { j =>
          done.put(e.jobId,
            ((System.nanoTime() - j.t0) / 1e9, j.stages, j.desc))
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    (1 to 2).foreach { rep =>
      spark.catalog.clearCache()
      System.gc()
      done.clear(); stg.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"== $q rep$rep total=$total%.2fs jobs=${done.size} " +
        f"stages=${stg.size} ==")
      done.toSeq.sortBy(_._1).foreach { case (id, (dt, st, desc)) =>
        val d = desc.replaceAll("\\s+", " ").take(60)
        println(f"  job$id%-4d ${dt}%6.3fs stages=$st%-3d $d")
      }
      stg.toSeq.sortBy(_._1).foreach { case (id, (dur, nt, run, gc, nm)) =>
        println(f"  stage$id%-4d wall=${dur}%6.3fs tasks=$nt%-3d " +
          f"taskrun=${run}%6.2fs gc=${gc}%5.2fs  $nm")
      }
    }
    spark.stop()
  }
}
