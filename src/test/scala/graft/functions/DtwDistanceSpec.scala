package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions

/** The codegen'd DTW must agree with a straightforward Scala reference
  * DP — the all-integer recurrence is what the q_dtw_profile oracle
  * replays, so any divergence here would break the hash gate.
  */
class DtwDistanceSpec extends SparkSpec {

  private def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
    val dp = Array.fill(a.length, b.length)(0L)
    for (i <- a.indices; j <- b.indices) {
      val cost = math.abs(a(i) - b(j))
      val best =
        if (i == 0 && j == 0) 0L
        else if (i == 0) dp(i)(j - 1)
        else if (j == 0) dp(i - 1)(j)
        else math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)), dp(i - 1)(j - 1))
      dp(i)(j) = cost + best
    }
    dp(a.length - 1)(b.length - 1)
  }

  test("graft_dtw equals the reference DP on known and generated series") {
    GraftExtensions.ensureRegistered(spark)
    val cases = Seq(
      (Seq(0L, 0L, 5L, 0L), Seq(0L, 5L, 0L, 0L)),       // shifted spike
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),               // identical → 0
      (Seq(10L), Seq(1L, 2L, 3L)),                      // length mismatch
      (Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L), Seq(2L, 7L, 1L, 8L, 2L, 8L)))
    for ((a, b) <- cases) {
      val got = spark.sql(
        s"SELECT graft_dtw(array(${a.mkString("L,")}L), " +
          s"array(${b.mkString("L,")}L)) AS d").head().getLong(0)
      assert(got === refDtw(a, b), s"mismatch on $a vs $b")
    }
    // shifted spike aligns: DTW 0, while pointwise L1 would be 10
    assert(refDtw(Seq(0L, 0L, 5L, 0L), Seq(0L, 5L, 0L, 0L)) === 0L)
  }

  test("empty and null arrays yield null") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_dtw(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS a,
                graft_dtw(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS b
      """).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types._
    val conv = CatalystTypeConverters.createToCatalystConverter(ArrayType(LongType))
    val a = Seq(3L, 1L, 4L, 1L, 5L)
    val b = Seq(2L, 7L, 1L, 8L)
    val e = DtwDistance(
      Literal(conv(a), ArrayType(LongType)),
      Literal(conv(b), ArrayType(LongType)))
    assert(e.eval(null) === refDtw(a, b))
  }
}
