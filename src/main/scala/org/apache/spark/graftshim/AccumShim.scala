package org.apache.spark.graftshim

import org.apache.spark.util.AccumulatorContext

/** Driver-side accumulator name lookup by ID.
  *
  * Executor heartbeats (`SparkListenerExecutorMetricsUpdate`) ship
  * `AccumulableInfo`s with `name = None` — the driver is expected to
  * resolve names from its own registry, which is exactly what the web
  * UI's status listener does. That registry (`AccumulatorContext`) is
  * `private[spark]`, so this one-method shim lives under the
  * `org.apache.spark` package — the conventional access pattern used by
  * Spark ecosystem test/metrics libraries. Nothing else in the engine
  * reaches into Spark internals.
  */
object AccumShim {
  /** The registered name of accumulator `id`, if it is still alive. */
  def nameOf(id: Long): Option[String] =
    AccumulatorContext.get(id).flatMap(_.name)
}
