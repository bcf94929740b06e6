package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Double-run determinism for every oracle-EXEMPT query.
  *
  * Hash-oracled queries get bit-stability checked against DuckDB every
  * round; the spec-only ones (sketches, LSH, IVF, zlib) had no
  * equivalent guard — a nondeterministic seed, an unordered reduce over
  * doubles, or partition-order-dependent state would pass their
  * invariant specs while producing different bytes per run. This pins
  * the engine's reproducibility contract: SAME input ⇒ SAME output,
  * byte-for-byte, for every declared query.
  */
class DeterminismSpec extends SparkSpec {

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("every oracle-exempt query is run-to-run deterministic") {
    val exempt = SparkEntry.allQ.filter(_.oracle.isEmpty)
    assert(exempt.nonEmpty)
    exempt.foreach { q =>
      val a = canon(SparkEntry.queries(q.name)(spark, sfDir).collect())
      val b = canon(SparkEntry.queries(q.name)(spark, sfDir).collect())
      assert(a.nonEmpty, s"${q.name}: empty result")
      assert(a == b, s"${q.name}: two identical runs diverged")
    }
  }
}
