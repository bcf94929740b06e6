package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Recall proof for the composed production dedup path (r5 verdict
  * item 1 — "the one 100-TB claim still resting on prose"): at scale
  * the exact shared-shingle self-join (q_dedup_ngram, measured slope
  * +1.11) is replaced by MinHash-banded candidate generation + exact
  * verify (q_dedup_band_verify). That substitution is only sound if
  * the banded candidates COVER the pairs the exact path emits — this
  * spec measures that coverage on the real sf0.1 corpus and pins it.
  *
  * Expected coverage from the banding curve P(candidate) =
  * 1 − (1 − J⁴)⁸ (32 hashes, 8 bands × 4): ≈ 0.40 at J = 0.5, 0.89 at
  * J = 0.7, 0.985 at J = 0.8, 0.9998 at J = 0.9 — so the spec asserts
  * TIERED floors (looser at low J, near-total at high J) and reports
  * the measured overall recall for SCALE.md.
  */
class DedupRecallSpec extends SparkSpec {

  test("banded candidates cover the exact J>=0.3 pair set at sf0.1") {
    val dir = sfPath("0.1")
    val exact = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .select(col("a"), col("b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "exact path found no pairs — corpus drifted?")

    val cands = Dedup.bandCandidates(spark, dir).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallAt(lo: Double, hi: Double): (Int, Int) = {
      val slice = exact.filter(p => p._3 >= lo && p._3 < hi)
      (slice.count(p => cands((p._1, p._2))), slice.length)
    }
    val (c3, n3) = recallAt(0.3, 0.7)
    val (c7, n7) = recallAt(0.7, 0.9)
    val (c9, n9) = recallAt(0.9, 2.0)
    val covered = c3 + c7 + c9
    val total = exact.length
    info(f"banded-candidate recall vs exact J>=0.3: $covered/$total = ${covered.toDouble / total}%.4f")
    info(f"  J in [0.3,0.7): $c3/$n3   J in [0.7,0.9): $c7/$n7   J >= 0.9: $c9/$n9")

    // tiered floors, each a comfortable margin under the banding curve's
    // expectation for the tier's LOWEST J
    if (n9 > 0) assert(c9.toDouble / n9 >= 0.99,
      s"J>=0.9 pairs must be all-but-certainly banded: $c9/$n9")
    if (n7 > 0) assert(c7.toDouble / n7 >= 0.75,
      s"J in [0.7,0.9) pairs expected >=89% banded: $c7/$n7")
    assert(covered.toDouble / total >= 0.6,
      s"overall recall collapsed: $covered/$total")
  }

  test("composed band->verify output is the banded subset of the exact pairs") {
    // the composed path must emit EXACTLY the exact-path pairs it banded
    // (no extras, no drops): its J >= 0.3 filter runs on the UNCAPPED
    // hashed-shingle Jaccard, so compare pair SETS restricted to banded
    // candidates — agreement here proves the verify stage is faithful
    val dir = sfPath("0.01")
    val exactPairs = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.bandCandidates(spark, dir).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val composed = SparkEntry.queries("q_dedup_band_verify")(spark, dir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(composed.subsetOf(cands), "composed path emitted un-banded pairs")
    val bandedExact = exactPairs.intersect(cands)
    // capped (exact path) vs uncapped (verify stage) Jaccard can disagree
    // only for pairs whose similarity rides ON the 0.3 boundary; demand
    // near-total agreement and report the residue
    val sym = (composed -- bandedExact) ++ (bandedExact -- composed)
    info(s"composed vs banded-exact symmetric difference: ${sym.size} " +
      s"(composed ${composed.size}, banded-exact ${bandedExact.size})")
    assert(sym.size <= math.max(2, bandedExact.size / 20),
      s"verify stage disagrees with the exact path beyond boundary noise: $sym")
  }
}
