package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {

  test("salted equi join is row-identical to the plain join") {
    // build a skewed fact: every lineitem keyed to ONE hot supplier + tail
    val fact = Tables.load(spark, sfDir, "lineitem")
      .withColumn("j_key", when(col("l_orderkey") % 4 < 3, 1L).otherwise(col("l_suppkey")))
    val dim = Tables.load(spark, sfDir, "supplier")
    val plain = fact.join(dim, col("j_key") === col("s_suppkey"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("s_suppkey").collect()
    val salted = SaltedJoin
      .saltedEquiJoin(fact, "j_key", dim, "s_suppkey", salts = 8, saltBy = "l_orderkey")
      .groupBy("s_suppkey").agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("s_suppkey").collect()
    assert(salted.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val df = Tables.load(spark, sfDir, "lineitem")
    val direct = df.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("long").as("cnt"), sum("l_quantity").as("sum"))
      .orderBy("l_returnflag").collect()
    val salted = SaltedJoin
      .twoPhaseAgg(df, "l_returnflag", "l_quantity", salts = 8, saltBy = "l_orderkey")
      .orderBy("l_returnflag").collect()
    assert(salted.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
  }

  test("approximate aggregates land within tolerance of exact") {
    val approx = graft.SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx $a vs exact $e")
    }
    val q = graft.SparkEntry.queries("q_approx_quantiles")(spark, sfDir).collect()
    q.foreach { r =>
      val (p50, p99) = (r.getDouble(r.fieldIndex("p50")), r.getDouble(r.fieldIndex("p99")))
      assert(p50 > 0 && p99 >= p50)
    }
  }
}
