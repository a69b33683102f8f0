package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured Streaming jobs mirroring the reference's DLT streaming
  * tables, plus their batch equivalents for the oracle gate.
  *
  * The transform functions take any events-shaped DataFrame — batch
  * or streaming — so the SAME logic is oracle-checked in batch (s34/
  * s35 queries entries) and driven through MemoryStream + watermarks
  * in StreamingSpec. This is the DLT pattern re-expressed Spark-
  * first: one declarative transform, two execution modes.
  *
  * Reference: watermarked windowed aggregation and stream-stream
  * joins in the silver DLT pipeline
  * (Silver Lake Mainnet.sql:41-64 chunks⋈blocks;
  * Silver Lake Mainnet - FT and NFT events.py:44-47 watermarks).
  *
  * Scale notes: streaming state is keyed by (window, event_type) /
  * join key and bounded by the watermark — state size is
  * O(keys × windows-in-watermark), not O(stream). Batch forms
  * shuffle once on the group/join key.
  */
object Streaming {

  /** Tumbling 15-minute windowed aggregation per event_type.
    * On a streaming input, call `.withWatermark("ts", ...)` before
    * this transform (see tumblingAggStreaming). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("events_count"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("window.start").as("bucket_start"),
        col("event_type"),
        col("events_count"), col("sum_value"))

  /** Streaming form: 30-minute watermark bounds state. */
  def tumblingAggStreaming(events: DataFrame): DataFrame =
    tumblingAgg(events.withWatermark("ts", "30 minutes"))

  /** s34 queries entry — batch equivalent on the events table. */
  def s34StreamTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables.events(s, dir)).orderBy("bucket_start", "event_type")

  val s34Sql: String =
    """SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket_start, event_type,
      | COUNT(*) AS events_count, ROUND(SUM(value),4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the preceding hour. Both sides keyed on
    * user_id; the time bound makes streaming state finite. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p.ts") >= col("c.ts") &&
          col("p.ts") <= col("c.ts") + expr("INTERVAL 1 HOUR"))
      .select(
        col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        round(col("p.value"), 4).as("purchase_value"))

  /** Streaming form: watermark both sides; the join's time-range
    * predicate lets Spark expire click state after 1h + watermark. */
  def clickPurchaseJoinStreaming(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clickPurchaseJoin(
      clicks.withWatermark("ts", "2 hours"),
      purchases.withWatermark("ts", "1 hour"))

  /** s35 queries entry — batch equivalent on the events table. */
  def s35StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val s35Sql: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      | p.event_id AS purchase_id, ROUND(p.value,4) AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type='click') c
      |JOIN (SELECT * FROM events WHERE event_type='purchase') p
      | ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY user_id, click_id, purchase_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s34_stream_tumbling" -> (s34StreamTumbling _),
    "s35_stream_join" -> (s35StreamJoin _))

  def oracles: Map[String, String] = Map(
    "s34_stream_tumbling" -> s34Sql,
    "s35_stream_join" -> s35Sql)
}
