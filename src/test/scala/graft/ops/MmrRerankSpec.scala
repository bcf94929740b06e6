package graft.ops

import graft.{SparkEntry, SparkSpec}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** q_mmr_rerank's greedy engine loop must equal the textbook greedy
  * MMR run over the same candidate pool — the spec replays it in plain
  * Scala on the collected 20-candidate frame (bounded readout: the
  * pool is k-sized by construction, this is test scaffolding, not the
  * query's data path).
  */
class MmrRerankSpec extends SparkSpec {

  test("engine greedy selection equals the reference MMR sequence") {
    GraftExtensions.ensureRegistered(spark)
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        call_function("graft_dot", col("embedding"), col("embedding"))
          .as("n2"))
      .filter(col("n2") > 0)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("pf"), col("n2").as("pn2"))
    val cands = emb.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        (call_function("graft_dot", col("pf"), col("embedding"))
          / sqrt(col("pn2") * col("n2"))).as("rel"),
        col("embedding"), col("n2"))
      .orderBy(col("rel").desc, col("vec_id")).limit(20)
    val pool = cands.collect().map { r =>
      (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).toArray, r.getDouble(3))
    }
    def cos(a: (Long, Double, Array[Float], Double),
            b: (Long, Double, Array[Float], Double)): Double = {
      var s = 0.0
      var i = 0
      while (i < math.min(a._3.length, b._3.length)) {
        s += a._3(i).toDouble * b._3(i).toDouble; i += 1
      }
      s / math.sqrt(a._4 * b._4)
    }
    // reference greedy: argmax rel first, then argmax 0.7·rel − 0.3·maxsim
    var selected = Vector(pool.maxBy(c => (c._2, -c._1)))
    while (selected.size < 5) {
      val rest = pool.filterNot(c => selected.exists(_._1 == c._1))
      val next = rest.maxBy { c =>
        val maxsim = selected.map(s0 => cos(c, s0)).max
        (0.7 * c._2 - 0.3 * maxsim, -c._1)
      }
      selected :+= next
    }
    val expected = selected.map(_._1)

    val got = SparkEntry.queries("q_mmr_rerank")(spark, sfDir)
      .orderBy("rank").collect().map(_.getLong(1)).toVector
    assert(got === expected,
      s"engine MMR sequence $got != reference $expected")
  }
}
