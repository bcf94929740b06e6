package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** The custom codegen'd dot product must agree bit-for-bit with the
  * composable aggregate(zip_with(...)) formulation it replaces — that
  * equivalence is what keeps the DuckDB oracles valid.
  */
class DotProductSpec extends SparkSpec {

  test("graft_dot equals aggregate(zip_with(...)) bit-for-bit on real embeddings") {
    GraftExtensions.ensureRegistered(spark)
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .limit(50)
      .select(
        call_function("graft_dot", col("embedding"), col("embedding")).as("native"),
        expr("""aggregate(zip_with(embedding, embedding,
                (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_dot handles nulls, empties, length mismatch, and double arrays") {
    GraftExtensions.ensureRegistered(spark)
    val out = spark.sql(
      """SELECT
           graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))  AS plain,
           graft_dot(array(1.0D, 2.0D, 9.0D), array(3.0D, 4.0D)) AS shorter,
           graft_dot(array(CAST(NULL AS DOUBLE), 2.0D), array(3.0D, 4.0D)) AS withnull,
           graft_dot(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)) AS empty,
           graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nullarr
      """).head()
    assert(out.getDouble(0) === 11.0)
    assert(out.getDouble(1) === 11.0)
    assert(out.getDouble(2) === 8.0)
    assert(out.getDouble(3) === 0.0)
    assert(out.isNullAt(4))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types._
    val conv = CatalystTypeConverters.createToCatalystConverter(ArrayType(DoubleType))
    val e = DotProduct(
      Literal(conv(Seq(1.5, -2.0, 3.0)), ArrayType(DoubleType)),
      Literal(conv(Seq(2.0, 0.5, 4.0)), ArrayType(DoubleType)))
    assert(e.eval(null) === (1.5 * 2.0 + -2.0 * 0.5 + 3.0 * 4.0))
  }
}
