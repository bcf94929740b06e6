package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import scala.collection.mutable

/** The bounded-heap top-k must agree exactly with the window-rank
  * formulation it replaces (same ordering contract: score desc, id asc).
  */
class TopKAggregatorSpec extends SparkSpec {

  test("heap semantics: keeps the k best under (score desc, id asc)") {
    val agg = new TopKAggregator(3)
    val items = Seq(
      Scored(1, 0.5), Scored(2, 0.9), Scored(3, 0.9), Scored(4, 0.1),
      Scored(5, 0.7), Scored(6, 0.9))
    val out = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    assert(out === Seq(Scored(2, 0.9), Scored(3, 0.9), Scored(6, 0.9)))
  }

  test("merge of partial heaps equals single-pass result") {
    val agg = new TopKAggregator(2)
    val (l, r) = (Seq(Scored(1, 3.0), Scored(2, 1.0)), Seq(Scored(3, 2.0), Scored(4, 9.0)))
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    val single = agg.finish((l ++ r).foldLeft(agg.zero)(agg.reduce))
    assert(merged === single)
    assert(merged === Seq(Scored(4, 9.0), Scored(1, 3.0)))
  }

  test("fewer than k inputs returns all, ordered") {
    val agg = new TopKAggregator(5)
    val out = agg.finish(Seq(Scored(2, 1.0), Scored(1, 2.0)).foldLeft(agg.zero)(agg.reduce))
    assert(out === Seq(Scored(1, 2.0), Scored(2, 1.0)))
  }

  test("graft_topk(id, score, k) honors the k literal in SQL (k=10 and k=1)") {
    GraftExtensions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "graft_dot(embedding, embedding) AS n2", "embedding")
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("n2").as("p_n2"))
    val scored = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (call_function("graft_dot", col("p_emb"), col("embedding"))
          / sqrt(col("p_n2") * col("n2"))).as("sim"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    for (k <- Seq(1, 10)) {
      val viaAgg = scored.groupBy("probe_id")
        .agg(expr(s"graft_topk(neighbor_id, sim, $k)").as("topk"))
        .select(col("probe_id"), explode(col("topk")).as("s"))
        .select(col("probe_id"), col("s.id").as("neighbor_id"), col("s.score").as("sim"))
        .orderBy(col("probe_id"), col("sim").desc, col("neighbor_id")).collect()
      val viaWindow = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select("probe_id", "neighbor_id", "sim")
        .orderBy(col("probe_id"), col("sim").desc, col("neighbor_id")).collect()
      assert(viaAgg.map(_.toSeq).toSeq === viaWindow.map(_.toSeq).toSeq, s"k=$k")
    }
  }

  test("graft_topk agrees with the window-rank formulation on real embeddings") {
    GraftExtensions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "graft_dot(embedding, embedding) AS n2", "embedding")
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("n2").as("p_n2"))
    val scored = emb.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (call_function("graft_dot", col("p_emb"), col("embedding"))
          / sqrt(col("p_n2") * col("n2"))).as("sim"))
    val viaAgg = scored.groupBy("probe_id")
      .agg(expr("graft_topk(neighbor_id, sim)").as("topk"))
      .select(col("probe_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("probe_id"), col("s.id").as("neighbor_id"), col("s.score").as("sim"))
      .orderBy(col("probe_id"), col("sim").desc, col("neighbor_id")).collect()
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    val viaWindow = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("probe_id", "neighbor_id", "sim")
      .orderBy(col("probe_id"), col("sim").desc, col("neighbor_id")).collect()
    assert(viaAgg.map(_.toSeq).toSeq === viaWindow.map(_.toSeq).toSeq)
  }
}
