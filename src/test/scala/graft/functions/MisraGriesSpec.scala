package graft.functions

import graft.SparkSpec
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

import scala.util.Random

/** Misra-Gries heavy-hitter guarantee: any token with true frequency
  * > n/(k+1) survives every (reduce, merge) tree — the property
  * `q_heavy_hitters` relies on to make its candidate pass lossless for
  * the exact verify. Checked both on the raw Aggregator (adversarial
  * merge trees, driver-side) and through a real multi-partition Spark
  * aggregation.
  */
class MisraGriesSpec extends SparkSpec {

  private def guaranteeHolds(tokens: Seq[String], k: Int,
      finish: Seq[String]): Unit = {
    val n = tokens.length
    val exact = tokens.groupBy(identity).view.mapValues(_.length).toMap
    val mustSurvive = exact.collect {
      case (t, c) if c.toLong * (k + 1) > n => t
    }.toSet
    val missing = mustSurvive -- finish.toSet
    assert(missing.isEmpty,
      s"tokens over n/(k+1)=${n.toDouble / (k + 1)} lost: $missing")
  }

  test("no false negatives on a skewed stream, any partitioning (k=8)") {
    val k = 8
    val rnd = new Random(7)
    val tokens = rnd.shuffle(
      Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
        (1 to 550).map(i => s"rare$i"))
    // single-pass reduce
    val mg = new MisraGries(k)
    val seqResult = mg.finish(tokens.foldLeft(mg.zero)(mg.reduce))
    guaranteeHolds(tokens, k, seqResult)
    // adversarial merge trees: uneven splits, recombined pairwise
    for (splits <- Seq(Seq(7, 993), Seq(500, 500), Seq(100, 200, 700),
      Seq.fill(100)(10))) {
      var rest = tokens
      val parts = splits.map { sz =>
        val (h, t) = rest.splitAt(sz); rest = t
        h.foldLeft(mg.zero)(mg.reduce)
      }
      val merged = parts.reduce(mg.merge)
      guaranteeHolds(tokens, k, mg.finish(merged))
    }
  }

  test("estimates undercount by at most n/(k+1) after merging") {
    val k = 8
    val rnd = new Random(11)
    val tokens = rnd.shuffle(
      Seq.fill(400)("a") ++ Seq.fill(200)("b") ++ (1 to 400).map(i => s"r$i"))
    val mg = new MisraGries(k)
    val (l, r) = tokens.splitAt(333)
    val merged = mg.merge(
      l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
    val exact = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bound = tokens.length.toDouble / (k + 1)
    merged.foreach { c =>
      val truth = exact.getOrElse(c.token, 0L)
      assert(c.cnt <= truth, s"${c.token}: estimate ${c.cnt} over-counts $truth")
      assert(truth - c.cnt <= bound,
        s"${c.token}: undercount ${truth - c.cnt} exceeds bound $bound")
    }
  }

  test("graft_mg through a 32-partition Spark agg keeps the guarantee") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new Random(13)
    val tokens = rnd.shuffle(
      Seq.fill(2000)("alpha") ++ Seq.fill(900)("beta") ++
        (1 to 5000).map(i => s"tail$i"))
    val ds = tokens.toDF("token").repartition(32)
    val cands = ds.agg(call_function("graft_mg", col("token"), lit(16)).as("c"))
      .head().getSeq[String](0)
    guaranteeHolds(tokens, 16, cands)
    assert(cands.contains("alpha") && cands.contains("beta"))
    assert(cands == cands.sorted, "finish must emit sorted candidates")
  }
}
