package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format connectors (engine surface beyond the driver's parquet).
  *
  * The reference's only "source" is a client-supplied in-memory vector
  * (`MapReduceClient.h:50,52`) — it has no storage layer at all. The
  * engine exposes the formats a 100-TB pipeline actually uses, each
  * through the DataFrame reader/writer so Catalyst keeps pushdown and
  * pruning where the format supports it (parquet/orc: predicate+column;
  * csv/json: column pruning only — documented trade-off).
  */
object FileSources {

  val formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  /** Schema-preserving write. CSV keeps a header for humans but readers
    * must still supply the schema (header names ≠ types).
    */
  /** Micro-precision timestamp formats for the text formats — their
    * defaults keep only milliseconds, which silently truncates event
    * times on a round trip.
    */
  private val textOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** `codec`: compression for the written files (e.g. "zstd" for
    * parquet/orc — the 100-TB default: ~2× smaller than snappy at
    * similar scan cost; "gzip" for the text formats). Empty = engine
    * default.
    */
  def write(df: DataFrame, path: String, format: String, codec: String = ""): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode("overwrite").format(format)
    val withCodec = if (codec.nonEmpty) w.option("compression", codec) else w
    val configured = format match {
      case "csv"  => withCodec.option("header", "true").options(textOpts)
      case "json" => withCodec.options(textOpts)
      case _      => withCodec
    }
    configured.save(path)
  }

  /** Schema-explicit read — schema inference on csv/json is both slow
    * (extra pass over 100 TB) and lossy (ints widen, timestamps become
    * strings), so the engine always passes the schema.
    */
  def read(spark: SparkSession, path: String, format: String, schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    val configured = format match {
      case "csv"  => r.option("header", "true").options(textOpts)
      case "json" => r.options(textOpts)
      case _      => r
    }
    configured.load(path)
  }

  /** Write a bucketed + sorted table: pre-shuffled by `bucketCols` into
    * `numBuckets` files per partition, registered in the session catalog.
    *
    * Scale rationale: two tables bucketed the same way join WITHOUT an
    * exchange — at 100 TB, bucketing the fact table once at ingest
    * removes the shuffle from every subsequent join on that key
    * (FileSourcesSpec asserts the shuffle-free plan).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout (`col=value/` directories).
    *
    * Scale rationale: a predicate on the partition column prunes whole
    * directories at planning time (PartitionFilters, zero I/O for
    * excluded partitions), and a join against a filtered dimension
    * prunes at RUNTIME via dynamic partition pruning — both asserted in
    * FileSourcesSpec. At 100 TB, date-partitioning the fact table is the
    * difference between scanning a day and scanning a decade.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
