package graft.core

/** The reference framework's client contract, re-expressed for Spark.
  *
  * Reference: `MapReduceClient.h:54-67` — a client supplies `map(k1, v1)`
  * emitting intermediate pairs via `emit2`, and `reduce(pairs)` over one
  * equal-key group emitting output pairs via `emit3`. The emit callbacks
  * existed to append into shared vectors under a global mutex
  * (`MapReduceFramework.cpp:22-39`, quirk Q3 in SURVEY §4.3); returned
  * iterators express the same dataflow with no shared state, so mappers
  * never serialize on a lock.
  *
  * `reduce` receives the key once plus the group's values — the
  * reference passes a vector of (key, value) pairs whose keys are all
  * ordering-equal (`MapReduceClient.h:61-64`), so the two forms carry
  * identical information.
  *
  * Contract notes carried over from the reference (SURVEY §4.3 Q7/Q8):
  * no intra-group value order and no output order are guaranteed.
  */
trait MapReduceClient[K1, V1, K2, V2, K3, V3] extends Serializable {
  def map(key: K1, value: V1): IterableOnce[(K2, V2)]
  def reduce(key: K2, values: Iterable[V2]): IterableOnce[(K3, V3)]
}

/** Job lifecycle stages — `MapReduceFramework.h:8-13`.
  * UNDEFINED_STAGE=0, MAP_STAGE=1, SHUFFLE_STAGE=2, REDUCE_STAGE=3.
  */
object Stage extends Enumeration {
  val Undefined, Map, Shuffle, Reduce, Done = Value
}

/** Observable job state — `MapReduceFramework.h:15-20` (`JobState`).
  *
  * Percentage is completed-task fraction of the current stage: monotone,
  * unlike the reference's claim-counting MAP% which overshoots then
  * clamps (`JobContext.cpp:268-273`, SURVEY §7.4-4).
  */
final case class JobState(stage: Stage.Value, percentage: Float)
