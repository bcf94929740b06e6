package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** `graft_zorder` must equal the composable shift-arithmetic formulation
  * bit-for-bit (so the DuckDB list-comprehension oracle stays exact) and
  * must actually deliver the locality property z-order layout exists for.
  */
class ZOrderSpec extends SparkSpec {

  test("graft_zorder equals the aggregate-over-bits formulation") {
    GraftExtensions.ensureRegistered(spark)
    val xs = spark.range(0, 2000)
      .select((col("id") * 7919 % 65536).as("x"), (col("id") * 104729 % 65536).as("y"))
    val both = xs.select(
      call_function("graft_zorder", col("x"), col("y"), lit(16)).as("z"),
      expr("""aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) ->
                acc + ((x div shiftleft(CAST(1 AS BIGINT), i)) % 2)
                        * shiftleft(CAST(1 AS BIGINT), 2 * i)
                    + ((y div shiftleft(CAST(1 AS BIGINT), i)) % 2)
                        * shiftleft(CAST(1 AS BIGINT), 2 * i + 1))""").as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_zorder known values and bit placement") {
    GraftExtensions.ensureRegistered(spark)
    def z(x: Long, y: Long): Long =
      spark.range(1).select(call_function("graft_zorder", lit(x), lit(y), lit(16)))
        .head().getLong(0)
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L) // x bit 0 → result bit 0
    assert(z(0, 1) === 2L) // y bit 0 → result bit 1
    assert(z(3, 1) === 7L)
    assert(z(65535, 65535) === (1L << 32) - 1) // full 16+16 bits
    // monotone block property: fixing high bits of both dims pins the
    // high bits of z — the tile census in q_zorder_layout relies on it
    assert(z(32768, 32768) === 3L << 30)
  }

  test("graft_zorder compiles under CODEGEN_ONLY — no interpreted fallback") {
    // Janino failures normally demote an expression to interpreted eval
    // with only a log line — results stay right, the codegen claim rots.
    // CODEGEN_ONLY turns that fallback into a hard error (whole-stage
    // codegen off so the per-operator projection path must compile it).
    GraftExtensions.ensureRegistered(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.range(0, 100)
        .select(call_function("graft_zorder", col("id"), col("id"), lit(16)).as("z"))
        .agg(sum("z")).head().getLong(0)
      assert(r > 0)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("z-tiles bound both dimensions (the pruning property)") {
    GraftExtensions.ensureRegistered(spark)
    // a z-tile of 2^20 values spans at most 2^10 cells per dimension:
    // tile bounds must always be tighter than the full 65536-cell space
    val tiles = spark.range(0, 100000)
      .select((col("id") * 48271 % 65536).as("x"), (col("id") * 16807 % 65536).as("y"))
      .select(shiftright(
        call_function("graft_zorder", col("x"), col("y"), lit(16)), 20).as("tile"),
        col("x"), col("y"))
      .groupBy("tile")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(tiles.length > 1)
    tiles.foreach { r =>
      assert(r.getLong(1) < 1024, s"tile ${r.getLong(0)} x-span ${r.getLong(1)}")
      assert(r.getLong(2) < 1024, s"tile ${r.getLong(0)} y-span ${r.getLong(2)}")
    }
  }
}
