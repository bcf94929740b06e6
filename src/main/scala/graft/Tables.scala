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

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet INT64 TIMESTAMP(NANOS) (which the vectorized
    * reader rejects — read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` and truncate to micros, the
    * same truncation DuckDB applies) and plain TIMESTAMP(MICROS) (which
    * Spark reads as TIMESTAMP_NTZ). Normalize both to session-zone
    * TimestampType — the session zone is pinned to UTC, so NTZ→LTZ is a
    * relabel with identical micros values and oracle hashes are unchanged.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        val ts = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            expr("timestamp_micros(ts div 1000)")
          case _ => col("ts").cast("timestamp")
        }
        raw.select(
          col("event_id"), ts.as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      case _ =>
        spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view (for SQL-surface queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
