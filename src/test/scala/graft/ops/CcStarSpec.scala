package graft.ops

import graft.SparkSpec
import scala.util.Random

/** Property coverage for the large-star/small-star connected-components
  * kernel ([[Dedup.ccStar]]) against a brute-force union-find oracle —
  * including the chain topology where plain min-label propagation needs
  * diameter rounds (the case that motivates the algorithm at 100 TB).
  */
class CcStarSpec extends SparkSpec {

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.ccStar(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph resolves to one component (label-prop worst case)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got == brute(chain))
    assert(got.values.toSet == Set(0L))
  }

  test("random sparse graphs match union-find (3 seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      val n = 200
      val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == brute(edges), s"seed $seed diverged")
    }
  }

  test("disjoint cliques keep distinct minimum representatives") {
    val cliques = Seq(Seq(10L, 11L, 12L), Seq(20L, 21L), Seq(30L, 31L, 32L, 33L))
    val edges = cliques.flatMap(c => c.combinations(2).map(p => (p(1), p(0))).toSeq)
    val got = run(edges)
    assert(got == brute(edges))
    assert(got.values.toSet == Set(10L, 20L, 30L))
  }

  test("duplicate and reversed edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
