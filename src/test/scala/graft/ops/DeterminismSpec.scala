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

  // zero-drift for the exemption list (the QList discipline applied to
  // oracles): every query without a DuckDB oracle must be on this
  // CLOSED list — a new query landing without an oracle fails here
  // instead of silently widening the exempt set. Round 12: 8 entries
  // (q_ann_ivf / q_knn_graph / q_semdedup / q_cluster_assign /
  // q_centroid_shift moved to oracled in r11-r12).
  private val IntendedExempt = Set(
    "q_approx_distinct", "q_approx_quantiles", "q_compression_ratio",
    "q_dedup_band_verify", "q_dedup_near", "q_dedup_near_incremental",
    "q_dedup_simhash", "q_embed_neardup")

  test("the oracle-exempt set is exactly the intended 8 (zero drift)") {
    val exempt = SparkEntry.allQ.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(exempt === IntendedExempt,
      s"exemption drift: unexpected ${exempt -- IntendedExempt}, " +
        s"newly oracled ${IntendedExempt -- exempt}")
  }

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
