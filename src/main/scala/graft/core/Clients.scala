package graft.core

import scala.collection.mutable

/** Ports of the reference repo's two shipped client workloads — the
  * framework's only "queries" (SURVEY §2.A A13/A14). Used by the parity
  * test suite; the relational re-expressions over the driver tables are
  * `q_charcount` and `q_mod_histogram`.
  */
object Clients {

  /** Character-frequency counter — `SampleClient.cpp:32-66`.
    *
    * map keeps the reference's in-record pre-aggregation (a local
    * histogram per string, `SampleClient.cpp:35-49` — the one combiner
    * the reference ever does); reduce sums per char.
    */
  final class CharCount extends MapReduceClient[Null, String, Char, Int, Char, Int] {
    def map(key: Null, value: String): IterableOnce[(Char, Int)] = {
      val h = mutable.Map.empty[Char, Int]
      value.foreach(c => h.update(c, h.getOrElse(c, 0) + 1))
      h.iterator
    }
    def reduce(key: Char, values: Iterable[Int]): IterableOnce[(Char, Int)] =
      Iterator.single(key -> values.sum)
  }

  /** Modulo-key histogram — `test1-1_thread_1_process.cpp:59-77`:
    * map k → (k mod 100, 1), reduce → (k, group size).
    */
  final class ModHistogram(uniqueKeys: Int = 100)
      extends MapReduceClient[Int, Null, Int, Int, Int, Int] {
    def map(key: Int, value: Null): IterableOnce[(Int, Int)] =
      Iterator.single(math.floorMod(key, uniqueKeys) -> 1)
    def reduce(key: Int, values: Iterable[Int]): IterableOnce[(Int, Int)] =
      Iterator.single(key -> values.size)
  }
}
