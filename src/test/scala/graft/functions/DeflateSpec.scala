package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins `graft_deflate_len` / q_compression_ratio invariants — the
  * spec-side contract for the one query whose kernel (zlib) has no
  * DuckDB twin.
  */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  test("deflate length orders repetitive below diverse text and is deterministic") {
    val rep = "spam " * 200                   // near-constant: tiny ratio
    val div = (0 until 1000)                  // high-entropy mixed alnum
      .map(i => java.lang.Long.toString((i * 2654435761L) % 936936, 36))
      .mkString(" ")
    val df = Seq(("rep", rep), ("div", div)).toDF("k", "txt")
      .select($"k", expr("graft_deflate_len(txt)").as("clen"),
        length($"txt").as("olen"))
    val rows: Map[String, (Int, Int)] = df.collect().map(r =>
      r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val (repC, repO) = rows("rep")
    val (divC, divO) = rows("div")
    assert(repC > 0 && divC > 0)
    // repetitive text compresses an order of magnitude harder
    assert(repC * 10 < repO, s"repetitive ratio too high: $repC/$repO")
    assert(repC.toDouble / repO < divC.toDouble / divO)
    // determinism: a second evaluation yields identical bytes counts
    val again = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(again("rep") == repC && again("div") == divC)
  }

  test("q_compression_ratio: permille bounds hold over the corpus") {
    val out = graft.SparkEntry.queries("q_compression_ratio")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (min, max) = (r.getAs[Long]("min_permille"), r.getAs[Long]("max_permille"))
      val avg = r.getAs[Double]("avg_permille")
      assert(min > 0, "compressed size must be positive")
      // deflate of ascii token soup never exceeds ~1.2x the original
      assert(max < 1200, s"ratio out of range: $max")
      assert(min <= avg && avg <= max)
    }
  }

  test("null text and empty-adjacent inputs are safe") {
    val df = Seq[Option[String]](None, Some("x"), Some(""))
      .toDF("txt")
      .select(expr("graft_deflate_len(txt)").as("clen"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got(0).isEmpty)           // null in -> null out
    assert(got(1).exists(_ > 0))
    assert(got(2).exists(_ >= 0))    // empty string: framing-free deflate
  }
}
