package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q_centroid_shift invariants (DeterminismSpec pins the bytes):
  * one row per label present in the table, cosines in [−1, 1], and the
  * vector counts reconcile with the corpus exactly.
  */
class CentroidShiftSpec extends SparkSpec {

  test("centroid shift: complete label set, valid cosines, counts reconcile") {
    val rows = SparkEntry.queries("q_centroid_shift")(spark, sfDir).collect()
    val labels = Tables.load(spark, sfDir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == labels.keySet,
      "output labels differ from the table's label set")
    rows.foreach { r =>
      assert(r.getLong(1) == labels(r.getLong(0)),
        s"label ${r.getLong(0)} vector count off")
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
    // centroids of a shared corpus should not be antipodal to the mean
    assert(rows.map(_.getDouble(2)).max > 0.0, "degenerate all-negative cosines")
  }
}
