package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Round-14 config A/B probe (guide §1): time a query list under two
  * runtime-conf sets, interleaved per query (A,B,A,B min-of-2 each) so
  * host drift hits both arms equally. Confs are session-level runtime
  * keys (AQE, thresholds) set via spark.conf — the base session is
  * Bench-identical. Prints per-query A/B seconds + job counts.
  *
  * Usage: sbt "runMain graft.ExpBench <qlist|all> <confA> <confB> [sfDir]"
  * where conf is `k=v;k=v` or `-` for no overrides.
  */
object ExpBench {
  def main(args: Array[String]): Unit = {
    val qs: Seq[String] =
      if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(',').map(_.trim).toSeq
    def parse(sv: String): Map[String, String] =
      if (sv == "-") Map.empty
      else sv.split(';').map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
    val confA = parse(args(1))
    val confB = parse(args(2))
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchConf(SparkSession.builder().master(s"local[$cpus]"),
      dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    val base = (confA.keySet ++ confB.keySet).map { k =>
      k -> spark.conf.getOption(k)
    }.toMap
    def withConf(c: Map[String, String])(f: => (Double, Int)): (Double, Int) = {
      c.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally base.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    def one(q: String): (Double, Int) = {
      spark.catalog.clearCache()
      System.gc()
      jobs.set(0)
      var failed = false
      val t0 = System.nanoTime()
      try SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed = true; System.err.println(s"[exp] $q: $e")
      }
      // NaN sentinel (r14 ADVICE): a conf arm that makes a query fail
      // fast must not win the A/B — NaN poisons the min and is excluded
      // from the totals below instead of flowing into them.
      val dt = if (failed) Double.NaN else (System.nanoTime() - t0) / 1e9
      Thread.sleep(30)
      (dt, jobs.get)
    }
    println("query,a_s,b_s,a_jobs,b_jobs")
    var ta = 0.0; var tb = 0.0
    qs.foreach { q =>
      val (a1, ja) = withConf(confA)(one(q))
      val (b1, jb) = withConf(confB)(one(q))
      val (a2, _) = withConf(confA)(one(q))
      val (b2, _) = withConf(confB)(one(q))
      val a = math.min(a1, a2); val b = math.min(b1, b2)
      // a failed arm excludes the QUERY from both totals so the sums
      // stay comparable
      if (!a.isNaN && !b.isNaN) { ta += a; tb += b }
      println(f"$q,$a%.2f,$b%.2f,$ja,$jb")
    }
    println(f"TOTAL,$ta%.2f,$tb%.2f,,")
    spark.stop()
  }
}
