package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Round-14 optimization evidence: dump `.explain("formatted")` for a
  * list of queries to `plans/r14/<query>_<tag>.txt`, one file each,
  * under the SAME session config as [[Bench]] (extensions, UTC, 32
  * shuffle partitions, the 64 MB static broadcast threshold) so the
  * committed plan text is the plan the bench actually times.
  *
  * Usage: `sbt "runMain graft.PlanSnap <tag> <q1,q2,...> [sfDir] [outDir]"`.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val qs: Seq[String] =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(',').map(_.trim).toSeq
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(3).getOrElse("plans/r15")
    val spark = BenchConf(SparkSession.builder().master("local[32]"), dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
      // cap like PlanDump: iterative queries print nested cache build
      // plans; the evidence is in the top operators + scans
      val lines = full.linesIterator.toSeq
      val MaxLines = 400
      val text =
        if (lines.size <= MaxLines) full
        else lines.take(MaxLines).mkString("\n") +
          s"\n... [truncated: ${lines.size - MaxLines} more lines of nested cache build plans]"
      // full query name in the file (r15): the round deliverable is
      // plans/rNN/<query>_{before,after}.txt keyed by the declared name
      Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"),
        s"== $q ($tag, $dir) ==\n" + text + "\n")
      println(s"wrote $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
