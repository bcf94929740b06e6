package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface: case-class encoders over the driver tables,
  * typed transforms agreeing with the untyped DataFrame formulations
  * (SURVEY §1.3: `Dataset[T]` + `Encoders.product` for opaque user
  * types).
  */
class TypedDatasetSpec extends SparkSpec {

  import TypedDatasetSpec._

  test("typed filter + groupByKey agg equals the untyped query") {
    import spark.implicits._
    val ds = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[OrderRow]
    val typed = ds.filter(_.o_orderstatus == "F")
      .groupByKey(_.o_custkey)
      .mapGroups((k, rows) => {
        var n = 0L; var sum = BigDecimal(0)
        rows.foreach { r => n += 1; sum += BigDecimal(r.o_totalprice).setScale(2, BigDecimal.RoundingMode.HALF_UP) }
        CustAgg(k, n, sum.toDouble)
      })
      .collect().map(c => (c.custkey, c.n, c.total)).sortBy(_._1).toSeq
    val untyped = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(typed === untyped)
  }

  test("typed map over Dataset preserves encoder schema") {
    import spark.implicits._
    val ds = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[OrderRow]
      .map(r => r.copy(o_totalprice = r.o_totalprice * 2))
    assert(ds.schema.fieldNames.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
    assert(ds.count() > 0)
  }
}

object TypedDatasetSpec {
  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)
  final case class CustAgg(custkey: Long, n: Long, total: Double)
}
