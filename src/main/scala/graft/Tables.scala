package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference engine's only "source" is a client-supplied in-memory
  * vector (reference `MapReduceClient.h:50,52`); here the sources are
  * columnar parquet scans so Catalyst gets pushdown + pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is written as parquet INT64 TIMESTAMP(NANOS), which the
    * vectorized reader rejects. We read it as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
    * TimestampType — the same truncation DuckDB (the oracle engine)
    * applies when it reads nanosecond parquet, so values compare equal.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/events.parquet").select(
          col("event_id"),
          expr("timestamp_micros(ts div 1000)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      case _ =>
        spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
