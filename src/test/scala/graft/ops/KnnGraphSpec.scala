package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall of the LSH-banded kNN graph (q_knn_graph) against the exact
  * all-pairs top-3 graph, computable only at spec scale (sf0.001).
  */
class KnnGraphSpec extends SparkSpec {

  test("q_knn_graph recall@3 vs exact graph ≥ 0.5, structure is sound") {
    val approx = SparkEntry.queries("q_knn_graph")(spark, sfDir)
      .select("vec_id", "neighbor_id", "rk").collect()
    assert(approx.nonEmpty)
    // per-vector at most 3 neighbors, ranks 1..n, no self-edges
    val byVec = approx.groupBy(_.getLong(0))
    byVec.foreach { case (v, rows) =>
      assert(rows.length <= 3, s"vec $v has ${rows.length} neighbors")
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length))
      assert(rows.forall(_.getLong(1) != v), s"vec $v lists itself")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding",
        "graft_dot(embedding, embedding) AS n2")
    val exact = emb.as("x").join(emb.as("y"),
        col("x.vec_id") =!= col("y.vec_id"))
      .selectExpr("x.vec_id AS vec_id", "y.vec_id AS neighbor_id",
        "graft_dot(x.embedding, y.embedding) / sqrt(x.n2 * y.n2) AS sim")
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rk") <= 3)
      .select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"kNN-graph recall@3 was $recall")
    info(s"recall@3 = $recall over ${byVec.size} vectors")
  }
}
