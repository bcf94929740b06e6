package graft
/** Print the declared-query name set (zero-drift audit vs SURVEY §2). */
object QList {
  def main(args: Array[String]): Unit =
    SparkEntry.allQ.map(_.name).sorted.foreach(n => println(s"QL $n"))
}
