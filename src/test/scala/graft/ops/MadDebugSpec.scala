package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MadDebugSpec extends SparkSpec {

  test("pass-2 rank over the joined dev frame equals the naive window") {
    val li = spark.read.parquet(sfPath("0.01") + "/lineitem.parquet")
    val med = RangeRank.ranked(
      li.select("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber"),
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")))
      .groupBy("l_returnflag")
      .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("l_extendedprice")))
        .as("med"))
      .withColumnRenamed("l_returnflag", "m_flag")
    val dev = li
      .join(med, col("l_returnflag") === col("m_flag"))
      .select(col("l_returnflag"), col("med"),
        abs(col("l_extendedprice") - col("med")).as("dev"),
        col("l_orderkey"), col("l_linenumber"))

    val naiveW = Window.partitionBy("l_returnflag")
      .orderBy(col("dev"), col("l_orderkey"), col("l_linenumber"))
    val naive = dev.select(col("l_returnflag"), col("dev"),
      col("l_orderkey"), col("l_linenumber"),
      row_number().over(naiveW).cast("long").as("rn"))
    val fast = RangeRank.ranked(dev,
      groupCols = Seq("l_returnflag"),
      sortCols = Seq(col("dev"), col("l_orderkey"), col("l_linenumber")),
      nName = None)
      .select(col("l_returnflag"), col("dev"),
        col("l_orderkey"), col("l_linenumber"), col("rn"))

    val onlyNaive = naive.exceptAll(fast)
    val onlyFast = fast.exceptAll(naive)
    val cn = onlyNaive.count(); val cf = onlyFast.count()
    if (cn > 0 || cf > 0) {
      println(s"=== onlyNaive=$cn onlyFast=$cf")
      onlyNaive.orderBy("l_returnflag", "rn").show(10, false)
      onlyFast.orderBy("l_returnflag", "rn").show(10, false)
    }
    assert(cn == 0 && cf == 0)
  }
}
