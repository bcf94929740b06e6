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
  /** Analyzed-plan memo: `spark.read.parquet` re-lists the directory
    * and re-reads the footer for schema inference on EVERY call, and a
    * 556-query battery calls load ~2000 times over the same ten
    * immutable files. The memoized DataFrame is just the analyzed
    * logical plan — immutable, cache-independent (clearCache does not
    * touch it), and exactly what a catalog serves at scale instead of
    * per-query file listings. Registered with [[graft.ops.Artifacts]]
    * so `invalidate(dir)` drops the keys when a caller mutates a dir.
    */
  private val loaded =
    graft.ops.Artifacts.memo[DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    loaded.computeIfAbsent((spark, s"$sfDir#$name"),
      _ => load0(spark, sfDir, name))

  private def load0(spark: SparkSession, sfDir: String, name: String): DataFrame =
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
