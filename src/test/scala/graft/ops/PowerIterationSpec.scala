package graft.ops

import graft.SparkSpec

/** q_power_iteration's convergence contract: after 5 matrix-free rounds
  * the direction is (numerically) a fixed point of the iteration — one
  * more round barely rotates it — and the Rayleigh quotient is
  * non-decreasing across rounds (the power-method invariant on a PSD
  * second-moment matrix). Determinism is DeterminismSpec's job.
  */
class PowerIterationSpec extends SparkSpec {

  private def vecOf(rounds: Int): (Array[Double], Double) = {
    val rows = VectorOps.powerIterate(spark, sfDir, rounds)
      .collect().sortBy(_.getLong(0))
    (rows.map(_.getLong(1).toDouble), rows.head.getDouble(2))
  }

  test("power iteration converges: cos(v5, v6) ~ 1, rayleigh non-decreasing") {
    val (v5, r5) = vecOf(5)
    val (v6, r6) = vecOf(6)
    val (v2, r2) = vecOf(2)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // convergence rate is (λ₂/λ₁)^rounds — at sf0.001's 50 vectors the
    // eigengap gives cos ≈ 0.9956 after 5 rounds; 0.99 is the honest
    // floor (the trend asserts the direction, the rayleigh monotonicity
    // asserts the method)
    val cos = dot(v5, v6) / math.sqrt(dot(v5, v5) * dot(v6, v6))
    assert(cos >= 0.99, s"direction still rotating after 5 rounds: cos=$cos")
    assert(r6 >= r5 - math.abs(r5) * 1e-9 && r5 >= r2 - math.abs(r2) * 1e-9,
      s"rayleigh not non-decreasing: r2=$r2 r5=$r5 r6=$r6")
    assert(v5.exists(_ != 0.0), "degenerate zero direction")
  }
}
