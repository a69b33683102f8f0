package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze-layer ingestion: schema'd JSON → typed, date-partitioned
  * records, as one transform usable in batch (`spark.read`) and
  * incremental (`spark.readStream` file source) mode.
  *
  * This re-expresses the reference's Autoloader bronze notebook
  * (reference: src/lakehouse/notebooks/Mainnet Loader.py — cloudFiles
  * JSON → bronze Delta with a derived block_date partition column)
  * Spark-first: the file-stream source is Spark's incremental
  * listing over a directory, the schema is explicit (no inference at
  * scale), malformed records land in a rescue column instead of
  * failing the pipeline, and the output carries the partition date
  * column that every downstream query prunes on.
  *
  * Scale notes: explicit schema means the reader never samples; each
  * file maps to ≥1 task with no coordination; the derived date
  * column is the physical partition key at 100 TB so silver queries
  * prune by date before touching data.
  */
object Ingest {

  /** Raw event envelope schema (the "wire format"). */
  val rawSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("ts_micros", LongType),
    StructField("user", StructType(Seq(
      StructField("uid", LongType),
      StructField("segment", StringType)))),
    StructField("kind", StringType),
    StructField("amount", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("_corrupt", StringType)))

  /** Shared bronze transform: envelope → typed columns + event_date
    * partition column. Works on batch and streaming input alike.
    *
    * `is_rescued` flags BOTH partially-corrupt rows (some fields
    * parsed, `_corrupt` populated) and fully-empty envelopes (all
    * data fields null). It deliberately references data columns in
    * addition to `_corrupt` so a quarantine count never prunes the
    * scan down to only the internal corrupt-record column — Spark
    * disallows that (QUERY_ONLY_CORRUPT_RECORD_COLUMN). */
  def bronzeTransform(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("event_id"),
      timestamp_micros(col("ts_micros")).as("ts"),
      col("user.uid").as("user_id"),
      col("user.segment").as("user_segment"),
      col("kind").as("event_type"),
      col("amount").as("value"),
      col("tags"),
      col("_corrupt"),
      (col("_corrupt").isNotNull ||
        (col("id").isNull && col("kind").isNull && col("ts_micros").isNull))
        .as("is_rescued"))
      .withColumn("event_date", to_date(col("ts")))

  /** Batch ingestion of a directory of JSON files. */
  def ingestBatch(s: SparkSession, jsonDir: String): DataFrame =
    bronzeTransform(
      s.read.schema(rawSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(jsonDir))

  /** Incremental ingestion: Spark's file-stream source picks up new
    * files per micro-batch (the Autoloader pattern on open Spark).
    * `maxFilesPerTrigger` bounds micro-batch size for backpressure. */
  def ingestStream(s: SparkSession, jsonDir: String): DataFrame =
    bronzeTransform(
      s.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", 16)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(jsonDir))
}
