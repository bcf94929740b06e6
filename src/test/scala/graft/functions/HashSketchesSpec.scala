package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The one-pass sketch expressions must be BIT-IDENTICAL to the round-1
  * explode → groupBy aggregation formulations they replaced (same
  * xxhash64 seed chaining), so swapping them changes plans, not results.
  */
class HashSketchesSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("graft_simhash equals the 64-weight aggregation formulation") {
    GraftExtensions.ensureRegistered(spark)
    val viaExpr = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(array_remove(col("toks"), "")) > 0)
      .select(col("doc_id"), call_function("graft_simhash", col("toks")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokHashes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), xxhash64(col("tok")).as("th"))
    val bitCols: Seq[Column] = (0 until 64).map { k =>
      sum(when(shiftright(col("th"), k).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"w$k")
    }
    val simhash = (0 until 64).map { k =>
      when(col(s"w$k") > 0, shiftleft(lit(1L), k)).otherwise(0L)
    }.reduce[Column](_.bitwiseOR(_))
    val viaAgg = tokHashes.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"), simhash.as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
    assert(viaExpr.nonEmpty)
  }

  test("graft_shingle_hashes equals the transform+xxhash64 formulation") {
    GraftExtensions.ensureRegistered(spark)
    val viaExpr = docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", split(col("text"), " "), lit(3)).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaHof = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(toks) >= 3
           THEN array_distinct(transform(sequence(0, size(toks) - 3),
                  i -> xxhash64(toks[i], toks[i+1], toks[i+2])))
           ELSE array() END""").as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaHof)
    assert(viaExpr.values.exists(_.nonEmpty))
  }

  test("graft_minhash equals the 32-min aggregation formulation") {
    GraftExtensions.ensureRegistered(spark)
    val arrs = docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", split(col("text"), " "), lit(3)).as("shs"))
      .filter(size(col("shs")) > 0)
    val viaExpr = arrs
      .select(col("doc_id"), call_function("graft_minhash", col("shs"), lit(32)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sh = arrs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val sigCols: Seq[Column] = (0 until 32)
      .map(k => min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
    val viaAgg = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong(_)).toSeq).toMap
    assert(viaExpr === viaAgg)
    assert(viaExpr.nonEmpty)
  }

  test("minhash signature agreement estimates exact Jaccard within 0.25 mean error") {
    // the unbiased-estimator property the whole MinHash ladder rests on:
    // over all-pairs of real documents, mean |est - exact| stays inside
    // the 1/√32 ≈ 0.18 standard error band (slack to 0.25 for the tail)
    GraftExtensions.ensureRegistered(spark)
    val arrs = docs
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", split(col("text"), " "), lit(3)).as("shs"))
      .filter(size(col("shs")) > 0)
      .limit(60)
    val rows = arrs
      .select(col("doc_id"), col("shs"),
        call_function("graft_minhash", col("shs"), lit(32)).as("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Long](2)))
    val errs = for {
      (ida, sa, siga) <- rows; (idb, sb, sigb) <- rows if ida < idb
    } yield {
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      val est = siga.zip(sigb).count { case (x, y) => x == y } / 32.0
      math.abs(est - exact)
    }
    assert(errs.nonEmpty)
    val mean = errs.sum / errs.size
    assert(mean <= 0.25, s"mean |minhash est - exact jaccard| was $mean")
  }

  test("edge cases: empty and short inputs") {
    GraftExtensions.ensureRegistered(spark)
    val row = spark.sql(
      """SELECT graft_simhash(array('', '')) AS s0,
                graft_shingle_hashes(array('a', 'b'), 3) AS sh0,
                graft_shingle_hashes(CAST(array() AS array<string>), 3) AS sh1,
                graft_simhash(CAST(NULL AS array<string>)) AS snull""").head()
    assert(row.getLong(0) === 0L)             // no non-empty tokens
    assert(row.getSeq[Long](1).isEmpty)        // fewer tokens than n
    assert(row.getSeq[Long](2).isEmpty)
    assert(row.isNullAt(3))                    // null in, null out
  }
}
