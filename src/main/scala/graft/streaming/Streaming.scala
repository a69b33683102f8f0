package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Typed event row for the custom-state streaming ops. */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)
case class RunningState(seq: Int, total: Double)
case class RunningOut(user_id: Long, event_id: Long, event_seq: Int,
                      running_value: Double)
/** Current-row emission of the APPLY CHANGES stream (s42): one row
  * per key per micro-batch; is_deleted marks a tombstoned key. */
case class ApplyOut(user_id: Long, event_id: Long, event_type: String,
                    value: Double, is_deleted: Boolean)

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

  /** Watermarked stream-stream LEFT OUTER join — s35's interval join
    * with NULL-completion semantics: every click row survives, and a
    * click with no purchase in its following hour emits exactly once
    * with NULL purchase columns, at the moment the watermark passes
    * the end of its match window (the state store can then prove no
    * future purchase can match). This is the last reference streaming
    * shape with no registered entry: the NEAR Social pipeline LEFT
    * JOINs a parsed stream to its derived object_keys stream with
    * both sides `WATERMARK ... DELAY OF INTERVAL 1 DAY`
    * (Silver Lake Mainnet - NEAR Social.sql:89) — unmatched parsed
    * rows must still flow to the silver table, completed with NULLs,
    * once the delay has provably expired. Re-expressed Spark-first:
    * `joinType="left_outer"` on the SAME watermarked interval join
    * s35 ships (Spark requires the time bound for exactly the reason
    * the reference requires the DELAY — it is what makes unmatched-
    * row emission decidable with finite state).
    *
    * Scale (100 TB/day): state is identical to s35's inner form —
    * both sides keyed by user_id, clicks retained for
    * 1h + 2h watermark, purchases for 1h — PLUS nothing: left-outer
    * adds no state, only an eviction-time emit of rows the inner
    * join would have dropped. The batch form is one shuffle on
    * user_id with the interval as a join residual. */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p.ts") >= col("c.ts") &&
          col("p.ts") <= col("c.ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(
        col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        round(col("p.value"), 4).as("purchase_value"))

  /** Streaming form: same watermarks as s35 — the outer side's
    * unmatched rows emit when the watermark crosses click.ts + 1h. */
  def clickPurchaseLeftJoinStreaming(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    clickPurchaseLeftJoin(
      clicks.withWatermark("ts", "2 hours"),
      purchases.withWatermark("ts", "1 hour"))

  /** s80 queries entry — batch equivalent on the events table. */
  def s80StreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    clickPurchaseLeftJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val s80Sql: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      | p.event_id AS purchase_id, ROUND(p.value,4) AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type='click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
      | ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin

  /** Gap-based sessionization via Spark's native session_window —
    * works identically over batch and streaming input (streaming
    * needs a watermark first; see sessionizeStreaming). A session
    * closes after 30 minutes of user inactivity.
    * Reference analog: per-account activity grouping in the gold
    * rollups, generalized to the canonical sessionize op. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("events_count"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("events_count"), col("sum_value"))

  def sessionizeStreaming(events: DataFrame): DataFrame =
    sessionize(events.withWatermark("ts", "1 hour"))

  /** s36 queries entry — batch sessionization on the events table. */
  def s36Sessionize(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir)).orderBy("user_id", "session_start")

  /** DuckDB oracle: classic lag/cumsum gap-sessionization — session
    * start = min(ts) within each gap-delimited group, which equals
    * session_window.start. */
  val s36Sql: String =
    """WITH flagged AS (
      | SELECT user_id, ts, value,
      |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |        <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      | FROM events),
      |numbered AS (
      | SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |   ROWS UNBOUNDED PRECEDING) AS session_no
      | FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      | COUNT(*) AS events_count, ROUND(SUM(value),4) AS sum_value
      |FROM numbered GROUP BY user_id, session_no
      |ORDER BY user_id, session_start""".stripMargin

  /** Per-user cumulative running totals — the batch face of the
    * custom-state streaming op (flatMapGroupsWithState form below).
    * One shuffle on user_id; the window is a single ordered pass. */
  def s37Cumulative(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"),
        row_number().over(w).as("event_seq"),
        round(sum(col("value")).over(w), 4).as("running_value"))
      .orderBy("user_id", "event_seq")
  }

  val s37Sql: String =
    """SELECT user_id, event_id,
      | CAST(row_number() OVER w AS INT) AS event_seq,
      | ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS UNBOUNDED PRECEDING), 4) AS running_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_seq""".stripMargin

  /** Streaming form of s37: arbitrary keyed state via
    * flatMapGroupsWithState — per-user (sequence, total) state that
    * survives across micro-batches. Events are ordered by event
    * time WITHIN a micro-batch; cross-batch ordering follows
    * arrival, the standard processing-time caveat for arbitrary
    * stateful ops (exact event-time ordering would need a watermark
    * + buffer in state). State is O(1) per user. */
  def runningTotalsStreaming(events: Dataset[EventRow]): Dataset[RunningOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[RunningState]) =>
          var st = state.getOption.getOrElse(RunningState(0, 0.0))
          val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
            st = RunningState(st.seq + 1, st.total + r.value)
            // same rounding as the batch face (Spark round = HALF_UP
            // on the decimal string); math.rint would be half-even
            // on the binary double and diverge at ties
            RunningOut(user, r.event_id, st.seq,
              BigDecimal(st.total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming → gold MERGE via foreachBatch: each micro-batch's
    * per-user aggregates are upserted into a keyed target table —
    * the reference's gold pattern (stream → MERGE INTO
    * gold_aggregated_circulating_supply, Aggregated Circulating
    * Supply Pipeline.py:100-110) on open Spark. Locally the target
    * is parquet with read-merge-swap; on a lakehouse table format
    * the body becomes one atomic MERGE INTO with identical
    * semantics. Accumulates (sum/count) across batches per key. */
  def defaultGoldWriter(targetDir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val s = batch.sparkSession
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val dst = new org.apache.hadoop.fs.Path(targetDir)
      val backup = new org.apache.hadoop.fs.Path(targetDir + ".backup")
      val tmpStr = targetDir + ".next"
      val tmp = new org.apache.hadoop.fs.Path(tmpStr)
      def readMarker(dir: org.apache.hadoop.fs.Path): Long = {
        val m = new org.apache.hadoop.fs.Path(dir, "_batchid")
        if (!fs.exists(m)) -1L
        else {
          val in = fs.open(m)
          try new String(in.readAllBytes(), "UTF-8").trim.toLong
          finally in.close()
        }
      }
      // crash recovery: a failed swap can leave the table only in the
      // backup slot — restore it before doing anything else
      if (!fs.exists(dst) && fs.exists(backup))
        require(fs.rename(backup, dst), s"could not restore $backup")
      // idempotency on top of foreachBatch's at-least-once delivery:
      // the applied batchId rides INSIDE the data directory (an
      // underscore-prefixed file parquet readers ignore), so data and
      // marker commit in the same rename — crash-atomic for this
      // writer. (Concurrent READERS can still observe a brief gap
      // between the two renames; reader atomicity is what a lakehouse
      // table format's MERGE INTO provides at scale.)
      // Legacy fallback: tables written before the in-dir marker kept
      // it at targetDir + ".batchid" — honor it so upgrading never
      // drops replay protection.
      val legacyMarker = new org.apache.hadoop.fs.Path(targetDir + ".batchid")
      val legacyApplied: Long =
        if (fs.exists(legacyMarker)) {
          val in = fs.open(legacyMarker)
          try new String(in.readAllBytes(), "UTF-8").trim.toLong
          finally in.close()
        } else -1L
      val lastApplied =
        math.max(if (fs.exists(dst)) readMarker(dst) else -1L, legacyApplied)
      if (batchId > lastApplied) {
        val agg = batch.groupBy(col("user_id")).agg(
          sum(col("value")).as("total_value"),
          count(lit(1)).as("events_count"))
        // only a genuinely MISSING target reads as empty; any other
        // read failure (corrupt footer, permissions, transient IO)
        // propagates instead of silently resetting the totals
        val existing =
          if (fs.exists(dst)) s.read.parquet(targetDir)
          else s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), agg.schema)
        val merged = existing
          .withColumnRenamed("total_value", "t_total")
          .withColumnRenamed("events_count", "t_count")
          .join(agg, Seq("user_id"), "full_outer")
          .select(
            col("user_id"),
            (coalesce(col("t_total"), lit(0.0)) + coalesce(col("total_value"), lit(0.0)))
              .as("total_value"),
            (coalesce(col("t_count"), lit(0L)) + coalesce(col("events_count"), lit(0L)))
              .as("events_count"))
        // stage the new table version + its marker, then swap via
        // backup. Every rename result is checked: Hadoop FileSystems
        // report failure by returning false, and an unchecked false
        // here would silently destroy the table
        merged.coalesce(1).write.mode("overwrite").parquet(tmpStr)
        val outS = fs.create(new org.apache.hadoop.fs.Path(tmp, "_batchid"), true)
        try outS.write(batchId.toString.getBytes("UTF-8"))
        finally outS.close()
        // backup slot must be GONE before the rename: Hadoop rename
        // onto an existing directory nests the source inside it
        fs.delete(backup, true)
        require(!fs.exists(backup), s"could not clear $backup")
        if (fs.exists(dst))
          require(fs.rename(dst, backup), s"could not back up $dst")
        require(fs.rename(tmp, dst), s"could not install $tmp as $dst")
        fs.delete(backup, true)
      }
    }

  /** Streaming dedup-at-ingest: drop duplicate records by key while
    * the stream flows, keeping state only within the watermark —
    * Spark 4's dropDuplicatesWithinWatermark means a duplicate
    * arriving within the lateness bound is suppressed and state is
    * evicted afterwards, so dedup state is O(keys-per-watermark),
    * not O(stream). The training-pipeline use: fingerprint-keyed
    * exact dedup (d22's key) applied before documents ever land. */
  def dedupStream(events: DataFrame, keys: String*): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Deterministic batch equivalent of dedup-at-ingest: keep the
    * EARLIEST record per key (ts, then event_id tie-break) — what
    * dropDuplicates* keeps on an in-order stream, made reproducible
    * for the oracle. One shuffle on the dedup key. */
  def dedupBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "ts", "user_id", "event_type", "value")
  }

  /** s38 queries entry — batch dedup-at-ingest on the events table. */
  def s38StreamDedup(s: SparkSession, dir: String): DataFrame =
    dedupBatch(Tables.events(s, dir))

  val s38Sql: String =
    """SELECT event_id, ts, user_id, event_type, value FROM (
      | SELECT event_id, ts, user_id, event_type, value,
      |  row_number() OVER (PARTITION BY user_id, event_type
      |                     ORDER BY ts, event_id) AS rn
      | FROM events) WHERE rn = 1""".stripMargin

  /** Decontamination-at-ingest: drop any incoming document that
    * shares a token n-gram with the held-out eval set — d29's scrub
    * moved to the stream boundary, so contaminated documents never
    * land. The eval side arrives as ONE static row holding the
    * distinct gram-key array (benchmark-sized, broadcast); the match
    * is a stream-static LEFT ANTI join at DOC granularity on
    * `arrays_overlap`, which is STATELESS — no watermark, no state
    * store, each input row decided once on arrival. The shared
    * [[graft.dedup.Dedup.gramKeys]] expression guarantees the stream
    * and d29's batch scrub key grams identically.
    *
    * (The batch-optimal formulation of the same semantics is d29's
    * exploded broadcast SEMI join; this transform deliberately keeps
    * the doc-granularity shape because that is what a stream can run
    * statelessly — the s39 batch entry runs THIS transform so the
    * oracle pins exactly what the stream computes.) */
  def decontaminateStream(docs: DataFrame, evalGramRow: DataFrame,
      n: Int): DataFrame =
    docs.withColumn("grams",
        graft.dedup.Dedup.gramKeys(split(col("text"), " "), n))
      .join(evalGramRow,
        arrays_overlap(col("grams"), col("eval_grams")), "left_anti")
      .drop("grams")

  /** The 1-row eval gram set for [[decontaminateStream]]: distinct
    * 60-bit gram keys of the eval slice collected into one array —
    * benchmark-sized static state, the stream side's broadcast. */
  def evalGramRow(evalDocs: DataFrame, n: Int): DataFrame =
    evalDocs.select(explode(
        graft.dedup.Dedup.gramKeys(split(col("text"), " "), n)).as("g"))
      .agg(collect_set(col("g")).as("eval_grams"))

  /** s39 queries entry — the decontaminated corpus: train-side docs
    * (doc_id % 53 ≠ 0, mirroring d29's eval split) that survive the
    * stream transform, run in batch mode on the documents table. */
  def s39StreamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val n = graft.dedup.Dedup.d29GramSize
    val docs = graft.Tables.documents(s, dir)
    val eval = evalGramRow(docs.filter(col("doc_id") % 53 === 0), n)
    // explicit-count repartition of the BATCH entry's train side (the
    // a42Base rationale): the per-doc cost downstream is eval-set-
    // sized (gram hashing plus an arrays_overlap probe against the
    // whole broadcast eval array), not row-sized, and the gate corpus
    // is one parquet split — the entire decide-on-arrival pass ran in
    // one task. The shared decontaminateStream transform is untouched
    // (a real ingest is already partitioned by its source); rows are
    // unchanged and the entry orders its own output.
    val nPart =
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 }
    decontaminateStream(
        docs.filter(col("doc_id") % 53 =!= 0).repartition(nPart, col("doc_id")),
        broadcast(eval), n)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for s39: same tokenization, windows, and 60-bit
    * gram key as d29's oracle; survivors via NOT EXISTS against the
    * eval gram set. */
  val s39Sql: String = {
    val n = graft.dedup.Dedup.d29GramSize
    s"""WITH toks AS (
       | SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS t
       | FROM documents),
       |grams AS (
       | SELECT doc_id,
       |  CAST(('0x' || substr(md5(array_to_string(t[i:i+${n - 1}], ' ')), 1, 15)) AS BIGINT) AS gram
       | FROM (SELECT doc_id, t,
       |        unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS i
       |       FROM toks)),
       |eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 53 = 0)
       |SELECT doc_id, lang, source, n_chars
       |FROM toks
       |WHERE doc_id % 53 <> 0
       |  AND NOT EXISTS (SELECT 1 FROM grams g
       |                  WHERE g.doc_id = toks.doc_id
       |                    AND g.gram IN (SELECT gram FROM eval_grams))
       |ORDER BY doc_id""".stripMargin
  }

  /** s40's stream transform: PII scrub + quarantine at ingest —
    * t43's projection applied unchanged to a stream of documents
    * (ONE definition via TextOps.piiCols, the s39/d29 sharing
    * stance), keeping only rows that contained PII. Stateless pure
    * projection: no watermark, no state store, no shuffle — the
    * shape that runs at any ingest rate. The scrubbed full corpus is
    * the same transform without the filter; the quarantine feed is
    * the operationally interesting stream (what audit/alerting
    * consumes). */
  def piiQuarantineStream(docs: DataFrame): DataFrame =
    graft.text.TextOps.piiCols(docs)
      .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0)

  /** s40 queries entry — the quarantine feed run in batch mode on
    * the documents table (the stream spec proves stream == batch). */
  def s40StreamPii(s: SparkSession, dir: String): DataFrame =
    piiQuarantineStream(graft.Tables.documents(s, dir))
      .orderBy("doc_id")

  /** DuckDB oracle for s40: t43's body filtered to PII carriers.
    * Plain concatenation — stripMargin on a template embedding the
    * body would eat the leading `|` of its `||` concat operators. */
  val s40Sql: String =
    "SELECT * FROM (\n" + graft.text.TextOps.piiBodySql +
      "\n) WHERE n_emails + n_phones + n_ips > 0\nORDER BY doc_id"

  /** s41's stream transform: quality-gate-at-ingest — t30's
    * composite score (ONE definition via TextOps.qualityScoreBp, the
    * s39/s40 sharing stance) computed statelessly at the stream
    * boundary, admitting only docs at or above t40's pipeline
    * threshold. The MassiveText-style front gate run where a real
    * ingest runs it: before anything is stored. Stateless pure
    * projection + filter — no watermark, no state store, no shuffle,
    * any ingest rate. */
  def qualityGateStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("quality_score_bp",
        graft.text.TextOps.qualityScoreBp(split(col("text"), " ")))
      .filter(col("quality_score_bp") >= graft.text.TextOps.t40QualityMinBp)

  /** s41 queries entry — the admitted corpus run in batch mode on
    * the documents table (the stream spec proves stream == batch). */
  def s41StreamQuality(s: SparkSession, dir: String): DataFrame =
    qualityGateStream(graft.Tables.documents(s, dir))
      .select("doc_id", "lang", "source", "n_chars", "quality_score_bp")
      .orderBy("doc_id")

  /** DuckDB oracle for s41: t30's score body (shared fragment)
    * filtered at the same threshold. */
  val s41Sql: String =
    "SELECT * FROM (\n" + graft.text.TextOps.qualityBodySql +
      s"\n) WHERE quality_score_bp >= ${graft.text.TextOps.t40QualityMinBp}\nORDER BY doc_id"

  /** s42: APPLY CHANGES INTO — the DLT CDC operator the reference's
    * silver layer is built on (`dlt.apply_changes(keys=…,
    * sequence_by=…, stored_as_scd_type=1, apply_as_deletes=…)`,
    * Silver Lake Mainnet accounts pipeline), re-expressed Spark-
    * first. Change rows are keyed by user_id, sequenced by
    * (ts, event_id), and 'error' rows act as the delete marker: the
    * target holds each key's highest-sequence row, and a key whose
    * latest change is a delete is ABSENT (tombstoned).
    *
    * Three faces, one semantics:
    * - [[applyChangesSnapshot]]: the full-recompute batch form
    *   (latest-per-key INCLUDING tombstone rows — they must keep
    *   their sequence so late-arriving stale updates still lose);
    * - [[applyChangesStream]]: Update-mode arbitrary state
    *   (mapGroupsWithState keeping one row per key — O(keys) state),
    *   emitting the key's current row (or its tombstone) each
    *   micro-batch; the out-of-order guard is the state comparison;
    * - [[s42ApplyChanges]], the queries entry: the INCREMENTAL path —
    *   a persisted pre-cutoff target snapshot (scratch parquet, the
    *   q30 persisted-gold stance) merged with the post-cutoff change
    *   stream. The oracle is the FULL RECOMPUTE in DuckDB: the gate
    *   pins DLT's central correctness property, incremental apply ==
    *   recompute from scratch.
    *
    * Scale: snapshot and merge are each one shuffle on the key;
    * state in the streaming face is one row per key; tombstones ride
    * in-band (filtered only at serving), so retention is a DELETE
    * WHERE on the target, not a special path. */
  def applyChangesSnapshot(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type", "value")
  }

  def applyChangesStream(events: Dataset[EventRow]): Dataset[ApplyOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[EventRow]) =>
          // Timestamp.compareTo keeps full micro/nano precision —
          // getTime would truncate to millis and disagree with the
          // batch face's ts ordering on sub-millisecond ties
          val newest = (state.getOption.iterator ++ rows)
            .maxBy(r => (r.ts, r.event_id))(
              Ordering.Tuple2(Ordering.ordered[java.sql.Timestamp], Ordering.Long))
          state.update(newest)
          ApplyOut(user, newest.event_id, newest.event_type, newest.value,
            newest.event_type == "error")
      }
  }

  /** Snapshot cutoff shared by s42 (incremental apply) and q35 (the
    * snapshot diff recovers the post-cutoff change feed). */
  private[graft] val s42Cutoff = "2024-01-16 00:00:00"

  def s42ApplyChanges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val targetDir = graft.sources.Export.scratch("s42_target", dir)
    // initial gold: snapshot of everything up to the cutoff,
    // PERSISTED and read back — the merge sees a real table, not a
    // plan branch
    applyChangesSnapshot(ev.filter(col("ts") <= lit(s42Cutoff)))
      .write.mode("overwrite").parquet(targetDir)
    val changes = ev.filter(col("ts") > lit(s42Cutoff))
      .select("user_id", "event_id", "ts", "event_type", "value")
    applyServing(
      applyChangesSnapshot(s.read.parquet(targetDir).unionByName(changes)))
  }

  /** The serving view over an apply-changes snapshot: tombstones
    * leave, the last-image columns get their serving names. ONE
    * definition shared by s42 and q77's time-travel reads. */
  private[graft] def applyServing(snap: DataFrame): DataFrame =
    snap.filter(col("event_type") =!= "error")
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        round(col("value"), 4).as("last_value"))
      .orderBy("user_id")

  /** DuckDB oracle for s42: the full recompute — latest-per-key over
    * ALL events with the delete rule applied at the end. Matching
    * the incremental Spark path IS the correctness property. */
  val s42Sql: String =
    """SELECT user_id, event_id AS last_event_id,
      | event_type AS last_event_type, ROUND(value,4) AS last_value
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** s43's stream transform: dedup-against-history at ingest — d35's
    * index leg moved to the stream boundary: a stream-static LEFT
    * ANTI join of incoming docs (fingerprinted in-stream by the
    * shared [[graft.text.TextOps.fingerprint]], so stream and batch
    * cannot disagree on the key) against the PERSISTED fingerprint
    * index — the same parquet artifact d35's batch classifier probes
    * (one definition via [[graft.dedup.Dedup.d35IndexAndBatch]]).
    * STATELESS, the s39 stance: the static side is a bounded keyed
    * relation, no watermark, no state store — each arriving doc is
    * decided once. Within-stream duplicates are s38's job
    * (dropDuplicatesWithinWatermark); composing the two reproduces
    * d35's full three-way classification at ingest: s43 drops
    * dup_of_index, s38 drops dup_in_batch, survivors == accepted.
    *
    * Scale: at 100 TB the index side is the d35 bucketed-by-
    * fingerprint layout; a micro-batch joins only its own rows
    * against it (the static side is loaded once and reused across
    * micro-batches by Structured Streaming). */
  def indexDedupStream(docs: DataFrame, index: DataFrame): DataFrame =
    docs.withColumn("fingerprint",
        graft.text.TextOps.fingerprint(col("text")))
      .join(index, Seq("fingerprint"), "left_anti")

  /** s43 queries entry — the stream transform run in batch mode on
    * d35's planted batch against d35's persisted index (the
    * StreamingSpec proves stream == batch and s43 == d35 minus
    * dup_of_index). */
  def s43StreamIndexDedup(s: SparkSession, dir: String): DataFrame = {
    val (index, batchDocs) = graft.dedup.Dedup.d35IndexAndBatch(s, dir)
    indexDedupStream(batchDocs, index)
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }

  /** DuckDB oracle for s43: d35's shared CTE prefix (same planted
    * content, same index membership), survivors = batch fingerprints
    * not in the index. */
  val s43Sql: String =
    s"""WITH ${graft.dedup.Dedup.d35CtePrefix}
       |SELECT doc_id, fingerprint FROM batch
       |WHERE fingerprint NOT IN (SELECT fingerprint FROM idx)
       |ORDER BY doc_id""".stripMargin

  /** s44's per-micro-batch transform: NEAR-dup admission at ingest —
    * d37's probe leg moved to the stream boundary, the fuzzy
    * counterpart of s43's exact anti join. A micro-batch of raw docs
    * is shingled and minhash-banded in flight (the shared
    * [[graft.dedup.Dedup.shingleSet]] / `md5BandStream` definitions,
    * so stream-time signatures cannot drift from the index's), band-
    * probes the PERSISTED d37 artifact
    * ([[graft.dedup.Dedup.d37BandIndex]] — the same parquet the
    * batch incremental run reads), verifies candidates with the ONE
    * shared exact-Jaccard [[graft.dedup.Dedup.verifyPairs]], and
    * anti-joins the verified near-dups out: what survives is the
    * admitted slice of the day's stream.
    *
    * This is deliberately a `foreachBatch` transform, not a
    * stream-native join: the probe→verify→anti chain needs two keyed
    * joins plus a distinct, which Structured Streaming cannot plan
    * stream-natively without state it doesn't need — each decision
    * depends only on the micro-batch row and the STATIC index, so
    * running the batch plan per micro-batch is stateless and exactly
    * replayable (the documented production pattern for enrich-then-
    * merge sinks, same stance as [[defaultGoldWriter]]). Scale: the
    * index side is band-keyed and bucketable (d37's layout); a
    * micro-batch shuffles only its own band rows; the verify
    * attaches shingles for candidates only.
    *
    * Within-batch near-dups are NOT this stage's job (the s43/s38
    * decomposition: history at ingest, within-day by the batch
    * pipeline). */
  def neardupAdmitBatch(batchDocs: DataFrame, index: DataFrame,
      corpus: DataFrame): DataFrame = {
    import graft.dedup.Dedup
    val shingled = batchDocs.select(col("doc_id"), Dedup.shingleSet.as("sh"))
    val dropIds = Dedup
      .verifyPairs(Dedup.indexBandCandidates(index, Dedup.md5BandStream(shingled)),
        corpus)
      .select(col("doc_b").as("doc_id")).distinct()
    batchDocs.select("doc_id").join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** s44 queries entry — the transform run on the full day's batch
    * against the real persisted d37 index. StreamingSpec drives the
    * same transform through real micro-batches and proves the union
    * equals this batch run. */
  def s44StreamNeardupAdmit(s: SparkSession, dir: String): DataFrame = {
    val index = graft.dedup.Dedup.d37BandIndex(s, dir)
    val raw = Tables.documents(s, dir)
      .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
    neardupAdmitBatch(raw, index, graft.dedup.Dedup.shingledDocs(s, dir))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for s44: the identical md5-affine pipeline
    * (shared CTE fragments), hits = batch docs with a verified
    * cross-split near-dup in history, admitted = batch minus hits. */
  val s44Sql: String = {
    import graft.dedup.Dedup
    s"""WITH ${Dedup.md5SigsCte},
       |banded AS (
       | SELECT s.doc_id, d.sh, s.* EXCLUDE (doc_id)
       | FROM sigs s JOIN docs d ON s.doc_id = d.doc_id),
       |hits AS (
       | SELECT doc_b AS doc_id FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |   ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |     / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
       |  FROM banded a JOIN banded b
       |   ON a.doc_id % 4 <> 0 AND b.doc_id % 4 = 0
       |   AND (${Dedup.bandEqSql}))
       | WHERE jaccard >= 0.7)
       |SELECT doc_id FROM documents
       |WHERE doc_id % 4 = 0 AND doc_id NOT IN (SELECT doc_id FROM hits)
       |ORDER BY doc_id""".stripMargin
  }

  /** s45: streaming MV refresh — q38's maintenance at the stream
    * boundary, the Structured-Streaming "live table": the persisted
    * partial-aggregate state folds forward one micro-batch at a
    * time through the ONE shared [[graft.operators.Relational
    * .q38Merge]] (state and delta stay in PARTIAL form — decimal
    * totals, mergeable maxes — so merges CHAIN; presentation
    * stringifies once at the end). Because the partial algebra is
    * associative and the decimal sum exact, ANY micro-batch slicing
    * of the day lands byte-exactly on the full recompute — this
    * entry folds two time slices and its oracle IS q38Sql, making
    * multi-step == one-step == recompute the gate property.
    * StreamingSpec drives the same fold through a REAL MemoryStream
    * + foreachBatch generation chain (each batch merges into a new
    * state generation — the Delta-style MV refresh loop) and lands
    * on the same rows. Scale: per batch the state side is MV-sized
    * and bucketed by customer; only the batch's partials shuffle. */
  def s45StreamMvRefresh(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val mvDir = graft.sources.Export.scratch("s45_mv", dir)
    val orders = Relational.q38Facts(s, dir)
    Relational.q38Partials(orders.filter(col("od") < lit(Relational.q38Cutoff)))
      .write.mode("overwrite").parquet(mvDir)
    var state = s.read.parquet(mvDir)
    for (slice <- Seq(
        col("od") >= lit(Relational.q38Cutoff) && col("od") < lit(s45Mid),
        col("od") >= lit(s45Mid))) {
      state = Relational.q38Merge(state,
        Relational.q38Partials(orders.filter(slice)))
    }
    Relational.q38Present(state).orderBy("o_custkey")
  }

  /** s45's second micro-batch boundary (orders run through 1998 at
    * every SF, so both slices are non-empty). */
  private[graft] val s45Mid = "1997-07-01"

  /** s45's oracle IS q38's full recompute: slicing the day into
    * micro-batches must be invisible. LAZY: Relational's own init
    * touches Streaming (q35Sql interpolates s42Cutoff), so an eager
    * read of q38Sql here would observe Relational mid-init (null) —
    * deferral breaks the cycle; by the time any oracles map is
    * materialized both objects are fully constructed. */
  lazy val s45Sql: String = graft.operators.Relational.q38Sql

  /** Attach the gold-merge sink to a stream of events. */
  def goldMergeQuery(events: DataFrame, targetDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch(defaultGoldWriter(targetDir))

  /** s46: the LIVE dataset card — t56's release rollup at the stream
    * boundary, the s45 stance applied to corpus observability: the
    * card's state persists as FINGERPRINT-level partials
    * ([[graft.text.TextOps.t56Partials]] — count/token-sum/score-sum
    * per (lang, source, fp), each algebraically mergeable), each
    * micro-batch of documents folds in through the ONE shared
    * [[graft.text.TextOps.t56MergeP]], and presentation
    * ([[graft.text.TextOps.t56Present]]) derives stratum counts,
    * exact integer means, distinct fingerprints AND global
    * cross-stratum dup membership from the partials alone. Because
    * every statistic is a sum over (lang, source, fp) cells, ANY
    * micro-batch slicing lands byte-exactly on the full recompute —
    * this entry folds three doc_id-residue slices and its oracle IS
    * t56Sql. The key design point: stratum-level partials could NOT
    * maintain dup_docs (a fingerprint straddling micro-batches or
    * strata would under-count); fingerprint-level state is the
    * minimal granularity that keeps the global dup ledger mergeable.
    *
    * Scale: state is fingerprint-cardinality (the d35 index size,
    * bucketable by fp); each refresh shuffles only the batch's
    * partials; presentation is a card-sized rollup. StreamingSpec
    * drives the same fold through a REAL MemoryStream + foreachBatch
    * generation chain and lands on the batch card. */
  def s46StreamCard(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextOps
    val cardDir = graft.sources.Export.scratch("s46_card", dir)
    val docs = TextOps.t56Project(graft.Tables.documents(s, dir))
    TextOps.t56Partials(docs.filter(pmod(col("doc_id"), lit(3)) === 0))
      .write.mode("overwrite").parquet(cardDir)
    var state = s.read.parquet(cardDir)
    for (r <- Seq(1, 2))
      state = TextOps.t56MergeP(state,
        TextOps.t56Partials(docs.filter(pmod(col("doc_id"), lit(3)) === r)))
    TextOps.t56Present(state)
  }

  /** s46's oracle IS t56's full recompute — micro-batch slicing of
    * the corpus must be invisible. LAZY per the s45Sql stance. */
  lazy val s46Sql: String = graft.text.TextOps.t56Sql

  /** s47: streaming expectations — q40's DLT data-quality audit kept
    * LIVE over an arriving event stream, the way a deployed DLT
    * pipeline actually surfaces expectations (per-micro-batch
    * metrics folded into the event log, not a nightly batch scan).
    * The rule table, the per-rule counters, and the presentation are
    * q40's OWN definitions ([[graft.operators.Relational.q40Rules]] /
    * q40Partials / q40Present) — the live audit cannot disagree with
    * the batch audit on any rule. Registered entry: the corpus
    * arrives as three residue micro-batches; batch 0's 1-row partial
    * persists as the audit state artifact, later batches fold in by
    * union (counter partials are associative), presentation at the
    * end — StreamingSpec drives the same fold through a REAL
    * MemoryStream + foreachBatch generation chain.
    *
    * Scale: state is ONE row of counters per generation regardless
    * of corpus size; each micro-batch contributes a map-side
    * conditional-sum row — the cheapest possible streaming
    * observability operator. */
  def s47StreamExpectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val stateDir = graft.sources.Export.scratch("s47_exp", dir)
    val ev = graft.Tables.events(s, dir)
    Relational.q40Partials(ev.filter(pmod(col("event_id"), lit(3)) === 0))
      .write.mode("overwrite").parquet(stateDir)
    var state = s.read.parquet(stateDir)
    for (r <- Seq(1, 2))
      state = state.union(
        Relational.q40Partials(ev.filter(pmod(col("event_id"), lit(3)) === r)))
    Relational.q40Present(state)
  }

  /** s47's oracle IS q40's full recompute — micro-batch slicing of
    * the audit must be invisible. LAZY per the s45Sql stance. */
  lazy val s47Sql: String = graft.operators.Relational.q40Sql

  /** s48's per-micro-batch transform: SEMANTIC admission at ingest —
    * d46's SemDeDup drop rule moved to the stream boundary, the
    * embedding counterpart of s44 (s43 exact text / s44 fuzzy text /
    * s48 semantic). A micro-batch of RAW vectors is routed through
    * the persisted quantizer artifact in flight
    * ([[graft.ann.Ann.a42RouteBatch]] — ONE definition with the
    * index build, so ingest routing cannot drift), probes the
    * history index with a cell equi-join, verifies candidates with
    * d46's rounded-cosine ≥ 0.4 rule verbatim, and anti-joins the
    * semantic near-dups out. Stateless vs the static artifact —
    * the s44 foreachBatch stance, same rationale. Within-batch
    * semantic dups are the batch pipeline's job (d46) — the s43/s38
    * decomposition. Scale: the index side is cell-keyed (Σ|cell|²
    * candidate bound, the d46 argument); a micro-batch shuffles only
    * its own routed rows; centroids + max-norm ride the broadcast. */
  def semanticAdmitBatch(batchRaw: DataFrame, mnorm: Double, c1: DataFrame,
      index: DataFrame): DataFrame = {
    val routed = graft.ann.Ann.a42RouteBatch(batchRaw, mnorm, c1, 2)
    val dropIds = routed.as("b").join(index.as("h"),
        col("b.cell") === col("h.cell"))
      .filter(round(graft.functions.VectorExprs.floatDot(
          col("b.embedding"), col("h.embedding"))
        / (col("b.norm") * col("h.norm")), 4) >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
    graft.functions.VectorExprs.withNorm(batchRaw).select("vec_id")
      .join(dropIds, Seq("vec_id"), "left_anti")
  }

  /** s48 queries entry: build the history artifact (quantizer trained
    * on vec_id % 4 ≠ 0 ONLY — the shared batch split; index = history
    * vectors exploded to their top-2 cells; metadata = centroid table
    * + max-norm scalar, all persisted parquet), then run the admission
    * transform on the full day's batch. StreamingSpec drives the same
    * transform through real micro-batches and proves the union equals
    * this batch run. */
  def s48StreamSemanticAdmit(s: SparkSession, dir: String): DataFrame = {
    import graft.ann.Ann
    // the history artifact (quantizer training + index write) behind
    // the bench's build/probe split (r15 — the s74-s79 stance: the
    // index outlives every batch; the ADMISSION is the served face)
    val (idxDir, c1Dir, mnorm) = graft.BuildCache.build(s"s48:$dir") {
      val hist = col("vec_id") % 4 =!= 0
      val (base, c1raw) = Ann.a42Refine(s, dir, hist)
      val e = graft.functions.VectorExprs.withNorm(
        Tables.embeddings(s, dir).select("vec_id", "embedding"))
      val i = graft.sources.Export.scratch("s48_index", dir)
      Ann.a42AssignTopFrom(base.filter(hist), c1raw, 2)
        .select(col("vec_id"), explode(col("cells")).as("cell"))
        .join(e, Seq("vec_id"))
        .write.mode("overwrite").parquet(i)
      val c = graft.sources.Export.scratch("s48_cents", dir)
      c1raw.write.mode("overwrite").parquet(c)
      // the artifact's max-norm scalar: one bounded 1-row driver
      // action (the q30/a36 stance — it IS the index metadata)
      val m = e.filter(hist).agg(max(col("norm"))).collect()(0).getDouble(0)
      (i, c, m)
    }
    val batchRaw = Tables.embeddings(s, dir)
      .select("vec_id", "embedding").filter(col("vec_id") % 4 === 0)
    semanticAdmitBatch(batchRaw, mnorm, s.read.parquet(c1Dir),
      s.read.parquet(idxDir))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for s48: the shared a42 build CTEs restricted to
    * history, both splits routed to their top-2 cells in the trained
    * basis, cell-join + rounded-cosine verify, batch minus hits.
    * Lazy: cross-object oracle refs at init are the known NPE cycle. */
  lazy val s48Sql: String =
    s"""WITH ${graft.ann.Ann.a42BuildCteWhere("vec_id % 4 <> 0")},
       |asgh AS (
       | SELECT vec_id, cell FROM (
       |  SELECT x.vec_id, c.cid AS cell,
       |   row_number() OVER (PARTITION BY x.vec_id
       |     ORDER BY list_sum(list_transform(list_zip(x.qv, c.qv),
       |       p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rnk
       |  FROM (SELECT * FROM ax WHERE vec_id % 4 <> 0) x, c1 c) WHERE rnk <= 2),
       |asgb AS (
       | SELECT vec_id, cell FROM (
       |  SELECT x.vec_id, c.cid AS cell,
       |   row_number() OVER (PARTITION BY x.vec_id
       |     ORDER BY list_sum(list_transform(list_zip(x.qv, c.qv),
       |       p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cid) AS rnk
       |  FROM (SELECT * FROM ax WHERE vec_id % 4 = 0) x, c1 c) WHERE rnk <= 2),
       |hits AS (
       | SELECT DISTINCT b.vec_id FROM asgb b
       | JOIN asgh h ON b.cell = h.cell
       | JOIN e eb ON eb.vec_id = b.vec_id
       | JOIN e eh ON eh.vec_id = h.vec_id
       | WHERE ROUND(list_sum(list_transform(list_zip(eb.embedding, eh.embedding),
       |     p -> CAST(p[1] AS DOUBLE) * p[2])) / (eb.norm * eh.norm), 4) >= 0.4)
       |SELECT vec_id FROM e
       |WHERE vec_id % 4 = 0 AND vec_id NOT IN (SELECT vec_id FROM hits)
       |ORDER BY vec_id""".stripMargin

  /** s49 micro-batch boundaries (events run Jan 1–30 at every SF, so
    * all three slices are non-empty). */
  private[graft] val s49Cut1 = "2024-01-11 00:00:00"
  private[graft] val s49Cut2 = "2024-01-21 00:00:00"
  private[graft] val s49K = 256

  /** The ONE micro-batch generation driver shared by every live fold
    * (s49–s59): persist each initial state frame as a generation-0
    * parquet artifact, then for each micro-batch run `fold` over the
    * READ-BACK state generations (state always comes off its
    * artifact, never a lineage chain — the s45 MV-refresh stance)
    * and persist the results as generation i+1. `init` pairs each
    * state frame with its artifact-name prefix; `fold` receives the
    * current states in `init` order plus the batch index (for
    * per-batch parameters like s56's advancing retain watermark) and
    * returns the next states in the same order. Returns the final
    * generation's frames. Scale: each generation writes only
    * state-sized artifacts; the loop is driver-side metadata only —
    * per-batch work is whatever `fold` plans, history never
    * reshuffles. Extracted from the eleven s49–s59 drivers (the r11
    * deferred review finding). */
  private[graft] def foldGenerations(s: SparkSession, stateDir: String,
      init: Seq[(String, DataFrame)], batches: Seq[DataFrame])(
      fold: (Seq[DataFrame], DataFrame, Int) => Seq[DataFrame]): Seq[DataFrame] = {
    var states = writeGeneration(s,
      init.map { case (p, df) => (s"$stateDir/${p}0", df) })
    batches.zipWithIndex.foreach { case (b, i) =>
      val next = fold(states, b, i)
      require(next.size == init.size,
        s"fold returned ${next.size} states for ${init.size} artifacts")
      states = writeGeneration(s,
        init.map(_._1).zip(next).map { case (p, df) =>
          (s"$stateDir/$p${i + 1}", df)
        })
    }
    states
  }

  /** Persist one generation's state frames and return their parquet
    * read-backs. The writes are INDEPENDENT actions — each next-state
    * plan reads only the PREVIOUS generation's artifacts plus the
    * batch slice, never a sibling of its own generation — so they are
    * submitted concurrently from a small thread pool (guide §2.6,
    * overlap independent jobs): one generation's wall cost becomes
    * max(state writes) instead of sum(state writes), and a subtree
    * two next-states share (e.g. s73's advanced-totals frame, feeding
    * both interval closers) no longer serializes its recomputations.
    * Row-for-row identical to the sequential form: the artifact paths,
    * the per-state plans, and the read-backs are unchanged — only the
    * submission order of the write actions differs. Any write failure
    * rethrows (Await propagates the first), preserving the fail-stop. */
  private def writeGeneration(s: SparkSession,
      named: Seq[(String, DataFrame)]): Seq[DataFrame] = {
    if (named.size <= 1)
      named.foreach { case (path, df) =>
        df.write.mode("overwrite").parquet(path) }
    else {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(named.size, 8))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.sequence(named.map { case (path, df) =>
          Future { df.write.mode("overwrite").parquet(path) }
        }), Duration.Inf)
      finally pool.shutdown()
    }
    named.map { case (path, _) => s.read.parquet(path) }
  }

  /** The standard three event-time micro-batch slices over an event
    * frame ([[s50Cut1]]/[[s50Cut2]] boundaries — events run Jan 1–30
    * 2024 at every SF, so all three are non-empty). */
  private[graft] def eventSlices(ev: DataFrame): Seq[DataFrame] = Seq(
    ev.filter(col("ts") < lit(s50Cut1)),
    ev.filter(col("ts") >= lit(s50Cut1) && col("ts") < lit(s50Cut2)),
    ev.filter(col("ts") >= lit(s50Cut2)))

  /** The [[eventSlices]] twin for the ORDER stream (o_orderdate runs
    * 1995–2001 at every SF, so all three are non-empty) — one
    * boundary definition for every order-fed fold (s59/s60; the
    * review pass caught the copy-paste drift risk). */
  private[graft] def orderSlices(ord: DataFrame): Seq[DataFrame] = Seq(
    ord.filter(col("o_orderdate") < lit("1998-01-01")),
    ord.filter(col("o_orderdate") >= lit("1998-01-01") &&
      col("o_orderdate") < lit("2000-01-01")),
    ord.filter(col("o_orderdate") >= lit("2000-01-01")))

  /** A bounded-key [[graft.functions.MisraGries]] summary of a
    * DataFrame slice, as (counters rows, 1-row err) — the sketch
    * STATE in relational form, writable as a parquet artifact. */
  private[graft] def mgSketchTables(s: SparkSession, keys: DataFrame)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val buf = keys.as[Long]
      .select(new graft.functions.MisraGries(s49K).toColumn.name("mg"))
      .as[graft.functions.MGBuf]
      .collect()(0) // ≤ k counters by construction — bounded state,
                    // the artifact a real sketch MV persists
    (buf.counters.toSeq.toDF("user_id", "cnt"),
      Seq(buf.err).toDF("err"))
  }

  /** ONE Misra–Gries merge step as DataFrame ops over two bounded
    * counter tables — the relational twin of [[graft.functions
    * .MisraGries.merge]] (counter-sum, then subtract the (k+1)-th
    * largest and keep positives; the cut value is a multiset order
    * statistic, so the row_number tie-break cannot change it). All
    * windows run over ≤ 2k+1 rows — state-sized, never the stream. */
  private[graft] def mgMergeTables(state: (DataFrame, DataFrame),
      delta: (DataFrame, DataFrame), k: Int): (DataFrame, DataFrame) = {
    val summed = state._1.unionAll(delta._1)
      .groupBy("user_id").agg(sum("cnt").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("user_id"))
    val ranked = summed.withColumn("rn", row_number().over(w))
    val cut = ranked.agg(
      coalesce(max(when(col("rn") === k + 1, col("cnt"))), lit(0L)).as("cut"))
    val merged = ranked.crossJoin(broadcast(cut))
      .withColumn("cnt", col("cnt") - col("cut"))
      .filter(col("cnt") > 0)
      .select("user_id", "cnt")
    val err = state._2.crossJoin(delta._2.select(col("err").as("derr")))
      .crossJoin(broadcast(cut))
      .select((col("err") + col("derr") + col("cut")).as("err"))
    (merged, err)
  }

  /** s49: streaming heavy hitters — q41's Misra–Gries sketch as a
    * LIVE mergeable-summary MV, the s45/s46 stance applied to the
    * frequency dashboard: the persisted state is the ≤ k-counter
    * table (+ its err scalar — artifact metadata like s48's
    * max-norm), and each micro-batch folds in through ONE merge rule
    * shared in law with the batch Aggregator ([[mgMergeTables]] ==
    * MisraGries.merge — StreamingSpec proves the fold equals the
    * one-shot batch sketch). Because the summary is mergeable
    * (Agarwal et al. 2013), ANY micro-batch slicing lands on a state
    * honoring the same [true−err, true] brackets; in the gate's
    * exact regime (150 users < k) every slicing lands on the EXACT
    * counts, so the oracle is q41's exact-count SQL verbatim.
    * Scale: per batch the exchange is the batch's own ≤ k-per-task
    * partials plus the k-row state — never history. */
  def s49StreamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("ts"), col("user_id"))
    val g0 = mgSketchTables(s,
      ev.filter(col("ts") < lit(s49Cut1)).select("user_id"))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s49_state", dir),
      Seq("c" -> g0._1, "m" -> g0._2),
      Seq(
        ev.filter(col("ts") >= lit(s49Cut1) && col("ts") < lit(s49Cut2)),
        ev.filter(col("ts") >= lit(s49Cut2)))) { (st, b, _) =>
      val next = mgMergeTables((st(0), st(1)),
        mgSketchTables(s, b.select("user_id")), s49K)
      Seq(next._1, next._2)
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("user_id"))
    fin(0)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("user_id"), col("cnt").as("events_count"))
      .orderBy("rank")
  }

  /** s49's oracle IS q41's exact top-20: in the exact regime every
    * micro-batch slicing of the stream folds to the exact counts.
    * Lazy: cross-object oracle refs at init are the known NPE cycle. */
  lazy val s49Sql: String = graft.operators.Relational.q41Sql

  /** s50's per-micro-batch state fold: the live funnel. State = one
    * row per user seen so far with the three witness timestamps
    * (v_ts, c_ts, p_ts — each null until its leg converts). A batch
    * folds in with q44's EXACT leg rules: the first view fills v_ts
    * (once — coalesce keeps the earlier witness); clicks qualify
    * only strictly after the (possibly just-filled) view witness and
    * within its 1-day horizon; purchases only strictly after the
    * click witness within ITS horizon. Precondition — and the
    * reason this fold is exact rather than approximate: micro-
    * batches arrive in EVENT-TIME ORDER (each batch is a later time
    * slice), the replay/backfill stance of q30 — under ordered
    * slicing every witness is final the moment it is written, so
    * fold(b1…bn) lands byte-exactly on the batch funnel over the
    * union (late data would need retained candidate events; that is
    * the documented tradeoff, not silent wrongness — the spec drives
    * the ordered form). Scale: per batch, three user-keyed
    * exchanges of the BATCH's filtered substreams against user-sized
    * state (bucketable by user_id); history never reshuffles. */
  def funnelFoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val bv = batch.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("bv"))
    val base = state.join(bv, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("v_ts"), col("bv")).as("v1"),
        col("c_ts").as("c0"), col("p_ts").as("p0"))
    val bc = batch.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
      .join(base.select(col("user_id"), col("v1")), Seq("user_id"))
      .filter(col("ts") > col("v1") &&
        col("ts") <= col("v1") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min(col("ts")).as("bc"))
    val withC = base.join(bc, Seq("user_id"), "left")
      .select(col("user_id"), col("v1"),
        coalesce(col("c0"), col("bc")).as("c1"), col("p0"))
    val bp = batch.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(withC.select(col("user_id"), col("c1")), Seq("user_id"))
      .filter(col("ts") > col("c1") &&
        col("ts") <= col("c1") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min(col("ts")).as("bp"))
    withC.join(bp, Seq("user_id"), "left")
      .select(col("user_id"), col("v1").as("v_ts"), col("c1").as("c_ts"),
        coalesce(col("p0"), col("bp")).as("p_ts"))
  }

  /** Present the funnel state as q44's 3-row step table (witness
    * counts are leg counts: p_ts non-null ⇒ c_ts non-null ⇒ v_ts
    * non-null by construction). */
  def funnelPresent(state: DataFrame): DataFrame =
    state.agg(
        count(col("v_ts")).as("u1"),
        count(col("c_ts")).as("u2"),
        count(col("p_ts")).as("u3"))
      .select(explode(array(
        struct(lit(1).as("step"), lit("view").as("step_name"),
          col("u1").as("users")),
        struct(lit(2).as("step"), lit("click").as("step_name"),
          col("u2").as("users")),
        struct(lit(3).as("step"), lit("purchase").as("step_name"),
          col("u3").as("users")))).as("st"), col("u1"))
      .select(col("st.step").as("step"), col("st.step_name").as("step_name"),
        col("st.users").as("users"),
        round(col("st.users").cast("double") / col("u1"), 4).as("conversion"))
      .orderBy("step")

  /** s50's micro-batch boundaries (events run Jan 1–30 2024 at every
    * SF, so all three slices are non-empty). */
  private[graft] val s50Cut1 = "2024-01-11"
  private[graft] val s50Cut2 = "2024-01-21"

  /** s50: the LIVE conversion funnel — q44 kept current over the
    * arriving event stream, the s45/s49 generation stance applied to
    * per-user witness state: state persists as a real parquet
    * artifact, each micro-batch (an event-time slice — the ordered
    * precondition [[funnelFoldBatch]] documents) folds in through
    * the ONE shared leg rule, and presentation derives the step
    * table from witness counts alone. The oracle IS q44's batch
    * recompute — under ordered slicing the fold must be invisible.
    * StreamingSpec drives the same fold through a REAL MemoryStream
    * + foreachBatch generation chain and lands on the batch rows. */
  def s50StreamFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val empty = ev.select(col("user_id"), col("ts").as("v_ts"),
      col("ts").as("c_ts"), col("ts").as("p_ts")).filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s50_funnel", dir),
      Seq("g" -> empty), eventSlices(ev)) { (st, b, _) =>
      Seq(funnelFoldBatch(st(0), b))
    }
    funnelPresent(fin(0))
  }

  /** s50's oracle IS q44's batch funnel — ordered micro-batch
    * slicing must be invisible. Lazy per the s45Sql stance. */
  lazy val s50Sql: String = graft.operators.Relational.q44Sql

  /** s51's per-micro-batch state fold: the live SCD2 dimension.
    * State = q32's full dimension table so far (closed rows + one
    * OPEN row per user). A batch of raw events folds in with q32's
    * exact change rule: an event is a change iff its type differs
    * from the previous EVENT's type — and between changes every
    * event carries the last change's type, so seeding the batch's
    * lag chain with the open row's attr_value is EQUAL to q32's
    * full-history lag (the induction the scaladoc of q32 relies
    * on). New versions continue the user's numbering (offset by the
    * open row's version), the open row closes at the batch's first
    * change, untouched users pass through. Exact under the same
    * event-time-ordered precondition as [[funnelFoldBatch]] — the
    * q30 replay stance, spec-driven. Scale: per batch one
    * user-keyed window over (seed ∪ batch) — batch-sized, never
    * history — plus user-keyed joins against the OPEN slice of the
    * state (one row per user, bucketable); closed history rows are
    * append-only and never reshuffle. */
  def scd2FoldBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val open = state.filter(col("is_current"))
      .select(col("user_id"), col("attr_value"), col("valid_from"), col("version"))
    val seed = open.select(col("user_id"),
      col("attr_value").as("event_type"), col("valid_from").as("ts"),
      lit(-1L).as("event_id"), lit(true).as("is_seed"))
    val ev = batch.select(col("user_id"), col("event_type"), col("ts"),
      col("event_id"), lit(false).as("is_seed"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val chg = seed.unionByName(ev)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(!col("is_seed") &&
        (col("prev").isNull || col("prev") =!= col("event_type")))
      .withColumn("bseq", row_number().over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
    val newRows = chg
      .join(open.select(col("user_id"), col("version").as("v0")), Seq("user_id"), "left")
      .select(col("user_id"), col("event_type").as("attr_value"),
        col("ts").as("valid_from"), col("next_ts").as("valid_to"),
        (coalesce(col("v0"), lit(0)) + col("bseq")).cast("int").as("version"),
        col("next_ts").isNull.as("is_current"))
    val firstChg = chg.filter(col("bseq") === 1)
      .select(col("user_id"), col("ts").as("close_ts"))
    val closedOpen = open.join(firstChg, Seq("user_id"))
      .select(col("user_id"), col("attr_value"), col("valid_from"),
        col("close_ts").as("valid_to"), col("version"), lit(false).as("is_current"))
    val untouchedOpen = open.join(firstChg, Seq("user_id"), "left_anti")
      .select(col("user_id"), col("attr_value"), col("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), col("version"),
        lit(true).as("is_current"))
    state.filter(!col("is_current"))
      .select("user_id", "attr_value", "valid_from", "valid_to", "version",
        "is_current")
      .unionByName(closedOpen).unionByName(untouchedOpen).unionByName(newRows)
  }

  /** s51: the LIVE SCD2 dimension — q32 maintained at the stream
    * boundary through persisted state generations (the s45/s50
    * stance), completing the temporal triangle: q32 builds the
    * dimension, q47 probes it point-in-time, s51 keeps it current.
    * The oracle IS q32's full recompute — ordered micro-batch
    * slicing must be invisible — and StreamingSpec drives the same
    * fold through a REAL MemoryStream + foreachBatch generation
    * chain onto the batch rows. */
  def s51StreamScd2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val empty = ev.select(col("user_id"), col("event_type").as("attr_value"),
      col("ts").as("valid_from"), col("ts").as("valid_to"),
      lit(1).as("version"), lit(true).as("is_current")).filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s51_scd2", dir),
      Seq("g" -> empty), eventSlices(ev)) { (st, b, _) =>
      Seq(scd2FoldBatch(st(0), b))
    }
    fin(0).orderBy("user_id", "version")
  }

  /** s51's oracle IS q32's SCD2 build — ordered slicing must be
    * invisible. Lazy per the s45Sql stance. */
  lazy val s51Sql: String = graft.operators.Relational.q32Sql

  /** s52's per-micro-batch state fold: the live retention activity
    * set. State = the distinct qualifying (user_id, week) pairs seen
    * so far — exactly [[graft.operators.Relational.q48ActivityPairs]]
    * of everything folded — and a batch folds in by unioning ITS
    * pairs and re-distincting. Unlike s50/s51 this fold needs NO
    * event-time-ordering precondition: distinct-set union is
    * commutative, associative, and IDEMPOTENT, so any slicing —
    * out-of-order batches, overlapping redelivery, at-least-once
    * sources — lands on the same state (the strongest replay
    * guarantee in this family; StreamingSpec drives a shuffled AND
    * redelivered chain to the same matrix). Scale: per batch one
    * user-keyed exchange of the BATCH's qualifying pairs (cut by the
    * predicate in the scan stage and by map-side distinct partials);
    * state is ≤ users × weeks rows, bucketable by user_id so the
    * union-distinct and the downstream cohort min co-locate. */
  def retentionFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
      graft.operators.Relational.q48ActivityPairs(batch)).distinct()

  /** s52: the LIVE cohort retention matrix — q48 kept current over
    * the arriving event stream through persisted state generations
    * (the s45/s50 stance): state is the activity-pair set, each
    * micro-batch folds in through [[retentionFoldBatch]], and
    * presentation derives the matrix through the SAME
    * q48Present body the batch entry uses. The oracle IS q48's
    * batch recompute — slicing (ordered or not) must be invisible. */
  def s52StreamRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val empty = ev.select(col("user_id"),
      col("ts").cast("date").as("week")).filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s52_retention", dir),
      Seq("g" -> empty), eventSlices(ev)) { (st, b, _) =>
      Seq(retentionFoldBatch(st(0), b))
    }
    graft.operators.Relational.q48Present(fin(0))
  }

  /** s52's oracle IS q48's batch retention matrix. Lazy per the
    * s45Sql stance. */
  lazy val s52Sql: String = graft.operators.Relational.q48Sql

  /** s53's register-state fold: the live HLL. State = q49's
    * (day, j, m) register table; a batch's events hash through the
    * SAME q49Rho/q49Registers definitions and max-merge in. Max is
    * associative, commutative, and IDEMPOTENT — the mergeable-
    * summaries property (Agarwal et al. 2013) HLL is built for —
    * so like s52 this fold is exact under ANY slicing including
    * redelivery, and the state is ≤ days × 256 rows no matter how
    * much data has streamed through. */
  def hllFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(graft.operators.Relational.q49Registers(
        graft.operators.Relational.q49Rho(batch)))
      .groupBy("day", "j").agg(max("m").as("m"))

  /** s53's exact-anchor fold: the gate instrument's state — the
    * distinct (day, user) pairs, union-distinct per batch (the s52
    * idempotent-set stance). At production scale this leg is
    * dropped and only the register state remains. */
  def hllExactFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
      graft.operators.Relational.q49ExactPairs(batch)).distinct()

  /** s53: the LIVE daily-uniques dashboard — q49 kept current over
    * the event stream through persisted state generations (the
    * s45/s50 stance), with BOTH legs mergeable: registers max-merge,
    * the exact anchor union-distincts, presentation derives through
    * the SAME q49Present. The oracle IS q49's batch recompute —
    * slicing, ordered or not, must be invisible. */
  def s53StreamHll(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val emptyReg = ev.select(col("ts").cast("date").as("day"),
      col("user_id").as("j"), lit(0).as("m")).filter(lit(false))
    val emptyPairs = ev.select(col("ts").cast("date").as("day"),
      col("user_id")).filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s53_hll", dir),
      Seq("r" -> emptyReg, "p" -> emptyPairs), eventSlices(ev)) { (st, b, _) =>
      Seq(hllFoldBatch(st(0), b), hllExactFoldBatch(st(1), b))
    }
    graft.operators.Relational.q49Present(fin(0),
      fin(1).groupBy("day").agg(count(lit(1)).as("exact_users")))
  }

  /** s53's oracle IS q49's batch sketch. Lazy per the s45Sql
    * stance. */
  lazy val s53Sql: String = graft.operators.Relational.q49Sql

  /** s54's count-state fold: the live transition matrix. State =
    * q50's (from_type, to_type) counts so far plus each user's LAST
    * event (the boundary witness). A batch folds in by running the
    * ONE shared [[graft.operators.Relational.q50PairCounts]] body
    * over (last-event seed ∪ batch): under the s50/s51 event-time-
    * ordered precondition the carried last event is the true
    * predecessor of the batch's first, so the per-generation counts
    * telescope to exactly the full-history matrix — counts then
    * sum-merge (associative + commutative, the q49-register stance,
    * though NOT idempotent: ordered at-most-once slicing is the
    * contract, same as s50/s51). Scale: per batch one user-keyed
    * window over (one seed row per user ∪ batch) — batch-sized,
    * never history; count state is ≤ |types|² rows; last-event state
    * is one row per user, bucketable by user_id so seed ∪ batch
    * co-locates with the window. */
  def transitionsCountFold(last: DataFrame, cnt: DataFrame,
      batch: DataFrame): DataFrame = {
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    val seed = last.select(cols.map(col): _*)
    cnt.unionByName(graft.operators.Relational.q50PairCounts(
        seed.unionByName(batch.select(cols.map(col): _*))))
      .groupBy("from_type", "to_type")
      .agg(sum(col("transitions")).as("transitions"))
  }

  /** s54's boundary-state fold: each user's latest event by the
    * (ts, event_id) total order over (carried last ∪ batch). */
  def transitionsLastFold(last: DataFrame, batch: DataFrame): DataFrame = {
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    last.select(cols.map(col): _*)
      .unionByName(batch.select(cols.map(col): _*))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
  }

  /** s54: the LIVE transition matrix — q50 kept current over the
    * event stream through persisted state generations (the s45/s50
    * stance, dual-artifact like s53): the count state sum-merges
    * each batch's shared-body pair counts, the last-event state
    * advances per user, presentation derives through the SAME
    * q50Present. The oracle IS q50's batch recompute — ordered
    * slicing must be invisible — and StreamingSpec drives the same
    * folds through a REAL MemoryStream + foreachBatch generation
    * chain onto the batch rows, with the cross-boundary transitions
    * proven counted. */
  def s54StreamTransitions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val emptyLast = ev.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type")).filter(lit(false))
    val emptyCnt = ev.select(col("event_type").as("from_type"),
      col("event_type").as("to_type"),
      col("event_id").as("transitions")).filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s54_transitions", dir),
      Seq("l" -> emptyLast, "c" -> emptyCnt), eventSlices(ev)) { (st, b, _) =>
      Seq(transitionsLastFold(st(0), b),
        transitionsCountFold(st(0), st(1), b))
    }
    graft.operators.Relational.q50Present(fin(1))
  }

  /** s54's oracle IS q50's batch matrix. Lazy per the s45Sql
    * stance. */
  lazy val s54Sql: String = graft.operators.Relational.q50Sql

  /** s55's summary-state fold: the live column profile. State = one
    * MERGEABLE per-column summary row (q52Stats of everything folded
    * so far); a batch folds in by computing ITS summary through the
    * SAME shared body and merging — counts sum (associative +
    * commutative; exactly-once slicing is the contract, the s54
    * count stance), extrema min/max (idempotent). No ordering
    * precondition: every aggregate here commutes. */
  def profileStatsFold(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(graft.operators.Relational.q52Stats(
        graft.operators.Relational.q52Stacked(batch)))
      .groupBy("col_name").agg(
        sum(col("cnt")).as("cnt"), sum(col("nulls")).as("nulls"),
        min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
        min(col("min_len")).as("min_len"), max(col("max_len")).as("max_len"))

  /** s55's exact-NDV anchor fold: the distinct (col_name, value)
    * set, union-distinct per batch — fully IDEMPOTENT (the s52/s53
    * set stance), so redelivery cannot grow it. At production scale
    * this leg swaps for q49's HLL registers per column (the s53
    * trade); in the gate regime it is the exact instrument. */
  def profileDistinctFold(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
      graft.operators.Relational.q52Stacked(batch)
        .filter(col("value_num").isNotNull || col("value_str").isNotNull)
        .distinct()).distinct()

  /** s55: the LIVE column profile — q52 kept current over the event
    * stream through persisted state generations (the s45/s50 stance,
    * dual-artifact like s53): the summary state merges each batch's
    * q52Stats partials, the distinct-value state union-distincts,
    * presentation derives through the SAME q52Present. The oracle IS
    * q52's batch profile — slicing must be invisible. Scale: the
    * summary state is |columns| rows forever; per batch one
    * col_name-keyed merge of batch-sized partials. */
  def s55StreamProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val emptyStats = graft.operators.Relational.q52Stats(
      graft.operators.Relational.q52Stacked(ev.filter(lit(false))))
    val emptyVals = graft.operators.Relational.q52Stacked(ev.filter(lit(false)))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s55_profile", dir),
      Seq("s" -> emptyStats, "v" -> emptyVals), eventSlices(ev)) { (st, b, _) =>
      Seq(profileStatsFold(st(0), b), profileDistinctFold(st(1), b))
    }
    graft.operators.Relational.q52Present(fin(0), fin(1))
  }

  /** s55's oracle IS q52's batch profile. Lazy per the s45Sql
    * stance. */
  lazy val s55Sql: String = graft.operators.Relational.q52Sql

  /** s56's per-micro-batch state fold: the live attribution ledger.
    * Dual state (the s53/s55 stance): the per-channel credit ledger
    * (merged by plain sums — [[graft.operators.Relational
    * .attributionRollup]] is distributive over disjoint conversion
    * sets, and ordered slicing puts each conversion in exactly one
    * batch) and the RETAINED TOUCH BUFFER — the touches still inside
    * any future conversion's 7-day lookback. A batch's conversions
    * are credited against buffer ∪ batch touches through the ONE
    * shared [[graft.operators.Relational.attributionCredits]] rule;
    * the buffer then prunes to touch_ts > nextCut − 7 days — the
    * watermark law that keeps state BOUNDED (7 days of touches per
    * user, never the stream's history) while staying exact: a batch-
    * (i+1) conversion has conv_ts ≥ cut_i, so its lookback floor is
    * ≥ cut_i − 7 days and nothing pruned can ever be credited.
    * Exactness precondition: event-time-ordered slices (the
    * funnelFoldBatch stance) — each touch precedes or shares the
    * batch of every conversion it can credit. */
  def attributionFoldBatch(stateAgg: DataFrame, stateTouch: DataFrame,
      batch: DataFrame,
      retainAfter: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val R = graft.operators.Relational
    val allTouch = stateTouch.unionByName(R.q55Touches(batch))
    val delta = R.attributionRollup(
      R.attributionCredits(R.q55Conversions(batch), allTouch))
    val merged = stateAgg.unionByName(delta).groupBy("channel").agg(
      sum(col("conversions")).as("conversions"),
      sum(col("touches")).as("touches"),
      sum(col("first_bp")).as("first_bp"),
      sum(col("last_bp")).as("last_bp"),
      sum(col("linear_bp")).as("linear_bp"))
    (merged, allTouch.filter(col("touch_ts") > retainAfter))
  }

  /** s56: LIVE multi-touch attribution — q55 kept current over the
    * arriving event stream through persisted state generations (the
    * s45/s50 stance): per batch, [[attributionFoldBatch]] credits
    * the batch's conversions against the bounded touch buffer and
    * merges the per-channel ledger; presentation is the ledger
    * itself, ordered. The oracle IS q55's batch attribution —
    * ordered slicing must be invisible. Scale: the ledger is
    * |channels| rows forever; the buffer holds 7 days of touches
    * (user_id-bucketable); per batch one user-keyed credit join +
    * one |channels|-row merge — history never reshuffles. */
  /** s56's retain watermark after each batch: the NEXT slice
    * boundary minus the 7-day lookback. After the LAST batch no
    * later boundary is known, so the watermark simply does not
    * advance — it stays at the last slice boundary (never a
    * corpus-end literal: a regenerated corpus or an added slice
    * cannot silently prune touches still inside a future
    * conversion's lookback). */
  private[graft] def s56RetainCuts: Seq[org.apache.spark.sql.Column] = Seq(
    lit(s50Cut1).cast("timestamp") - expr("INTERVAL 7 DAY"),
    lit(s50Cut2).cast("timestamp") - expr("INTERVAL 7 DAY"),
    lit(s50Cut2).cast("timestamp") - expr("INTERVAL 7 DAY"))

  def s56StreamAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val emptyAgg = R.attributionRollup(R.attributionCredits(
      R.q55Conversions(ev.filter(lit(false))),
      R.q55Touches(ev.filter(lit(false)))))
    val emptyBuf = R.q55Touches(ev.filter(lit(false)))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s56_attribution", dir),
      Seq("a" -> emptyAgg, "t" -> emptyBuf), eventSlices(ev)) { (st, b, i) =>
      val (a, t) = attributionFoldBatch(st(0), st(1), b, s56RetainCuts(i))
      Seq(a, t)
    }
    fin(0).orderBy(col("channel"))
  }

  /** s56's oracle IS q55's batch attribution. Lazy per the s45Sql
    * stance. */
  lazy val s56Sql: String = graft.operators.Relational.q55Sql

  /** s57's per-micro-batch state fold: the live daily ledger behind
    * the anomaly detector. State = (day, purchases); a batch folds
    * in by summing its own q57Daily rollup into the ledger —
    * sum-merge is associative and commutative over ANY slicing of
    * the stream (days split across batches just add), so unlike the
    * witness folds (s50/s56) this one needs NO event-time-order
    * precondition — only exactly-once delivery (sums are not
    * idempotent; the spec drives a shuffled residue slicing to pin
    * the order-independence). */
  def anomalyFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(graft.operators.Relational.q57Daily(batch))
      .groupBy("day").agg(sum(col("purchases")).as("purchases"))

  /** s57: LIVE robust anomaly detection — q57 kept current over the
    * arriving event stream through persisted ledger generations
    * (the s45/s50 stance): per batch one day-keyed sum-merge of a
    * map-side-combined batch rollup; presentation recomputes
    * median/MAD/z through the SAME q57Present over the |days|-sized
    * ledger (holistic statistics are fine over 365 rows/year — the
    * detector re-baselines on every refresh, which is exactly what
    * a live median/MAD monitor must do as the series grows). The
    * oracle IS q57's batch SQL — slicing must be invisible. Scale:
    * the ledger is |days| rows forever; history never reshuffles. */
  def s57StreamAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s57_anomaly", dir),
      Seq("g" -> R.q57Daily(ev.filter(lit(false)))),
      eventSlices(ev)) { (st, b, _) =>
      Seq(anomalyFoldBatch(st(0), b))
    }
    R.q57Present(fin(0))
  }

  /** s57's oracle IS q57's batch anomaly profile. Lazy per the
    * s45Sql stance. */
  lazy val s57Sql: String = graft.operators.Relational.q57Sql

  /** s58's per-micro-batch state fold: the live current-window bin
    * ledger behind the PSI monitor. The edges are the FROZEN
    * artifact (trained once from the reference window, the s48
    * history-trained stance) — a batch folds in by binning its own
    * current-window purchases against the broadcast edges and
    * sum-merging the 10-row ledger. Like s57's sum-merge this is
    * associative/commutative over ANY slicing — no event-time-order
    * precondition, only exactly-once delivery. */
  def psiFoldBatch(state: DataFrame, batch: DataFrame,
      edges: DataFrame): DataFrame = {
    val R = graft.operators.Relational
    val cur = batch.filter(col("event_type") === "purchase")
      .filter(col("ts") >= lit(R.q59Cut)).select(col("ts"), col("value"))
    state.unionByName(R.q59Bins(cur, edges))
      .groupBy("bin").agg(sum(col("n")).as("n"))
  }

  /** s58: the LIVE PSI drift monitor — q59 kept current over the
    * arriving stream through persisted ledger generations (the
    * s45/s50 stance): the reference bin counts and the frozen
    * decile edges persist ONCE as the monitor's trained artifact
    * (the s48 stance — baselines move only on re-train); each batch
    * sum-merges its current-window bins; presentation reruns the
    * SAME q59Present over the two 10-row ledgers. The oracle IS
    * q59's batch SQL — slicing must be invisible. Scale: both
    * ledgers are 10 rows forever; the edge frame is 1 row; per
    * batch one broadcast bin-count — history never reshuffles. */
  def s58StreamPsi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val stateDir = graft.sources.Export.scratch("s58_psi", dir)
    val ref = ev.filter(col("event_type") === "purchase")
      .filter(col("ts") < lit(R.q59Cut)).select(col("ts"), col("value"))
    // the trained artifact: frozen edges + the reference ledger
    R.q59Edges(ref).write.mode("overwrite").parquet(s"$stateDir/edges")
    val edges = s.read.parquet(s"$stateDir/edges")
    R.q59Bins(ref, edges).withColumnRenamed("n", "ref_n")
      .write.mode("overwrite").parquet(s"$stateDir/ref")
    val fin = foldGenerations(s, stateDir,
      Seq("g" -> R.q59Bins(ref.filter(lit(false)), edges)),
      eventSlices(ev)) { (st, b, _) =>
      Seq(psiFoldBatch(st(0), b, edges))
    }
    R.q59Present(s.read.parquet(s"$stateDir/ref"),
      fin(0).withColumnRenamed("n", "cur_n"))
  }

  /** s58's oracle IS q59's batch PSI. Lazy per the s45Sql stance. */
  lazy val s58Sql: String = graft.operators.Relational.q59Sql

  /** s59's per-micro-batch state fold: the live Benford digit
    * ledger. A batch of ORDERS folds in by sum-merging its own
    * q63Digits rollup — associative/commutative over any slicing
    * (the s57/s58 sum-merge stance: no event-time-order
    * precondition, only exactly-once delivery). */
  def benfordFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(graft.operators.Relational.q63Digits(batch))
      .groupBy("digit").agg(sum(col("n")).as("n"))

  /** s59: the LIVE Benford audit — q63 kept current over the
    * arriving order stream through persisted ledger generations
    * (the s45/s50 stance): per batch one 9-row digit sum-merge;
    * presentation reruns the SAME q63Present (expectations are
    * constants, so the audit re-baselines for free as mass
    * arrives). The oracle IS q63's batch SQL — slicing must be
    * invisible. Scale: the ledger is ≤ 9 rows forever; per batch
    * one map-side-combined digit count — history never
    * reshuffles. */
  def s59StreamBenford(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val R = graft.operators.Relational
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s59_benford", dir),
      Seq("g" -> R.q63Digits(ord.filter(lit(false)))),
      orderSlices(ord)) { (st, b, _) =>
      Seq(benfordFoldBatch(st(0), b))
    }
    R.q63Present(fin(0))
  }

  /** s59's oracle IS q63's batch audit. Lazy per the s45Sql
    * stance. */
  lazy val s59Sql: String = graft.operators.Relational.q63Sql

  /** s60: the LIVE quantile dashboard — q68 kept current over the
    * arriving order stream through persisted state generations (the
    * s45/s50 stance, dual-artifact like s53): the bottom-k sample
    * state folds by [[graft.operators.Relational.q68SampleFold]]
    * (exact merge law + idempotent under redelivery — like s52/s53
    * this fold is exact under ANY slicing, the strongest replay
    * guarantee in the family), the exact-anchor state union-
    * distincts, presentation derives through the SAME q68Present.
    * The oracle IS q68's batch sketch — slicing must be invisible.
    * Scale: the sample state is ≤ k rows per group FOREVER — the
    * bounded-memory promise the quantile sketch exists for; per
    * batch one (grp, draw)-keyed rank window over (state ∪ batch);
    * the exact anchor is the declared gate instrument (the s53
    * trade). */
  def s60StreamQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val R = graft.operators.Relational
    val empty = R.q68Src(ord.filter(lit(false)))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s60_quantiles", dir),
      Seq("s" -> empty, "x" -> empty),
      orderSlices(ord)) { (st, b, _) =>
      Seq(R.q68SampleFold(st(0), b), R.q68ExactFold(st(1), b))
    }
    R.q68Present(fin(1), fin(0))
  }

  /** s60's oracle IS q68's batch sketch. Lazy per the s45Sql
    * stance. */
  lazy val s60Sql: String = graft.operators.Relational.q68Sql

  /** s61: the LIVE XmR control chart — q71 kept current over the
    * arriving event stream through persisted ledger generations (the
    * s45/s50 stance): the state IS q57's daily ledger, folded by the
    * SAME [[anomalyFoldBatch]] day-keyed sum-merge s57 uses (one
    * ledger definition serves TWO live detectors — robust z and SPC
    * limits), presentation reruns the SAME q71Present, whose limits
    * re-baseline as the series grows — exactly what a live control
    * chart must do. Sum-merge needs no event-time order, only
    * exactly-once delivery (the s57 stance). The oracle IS q71's
    * batch SQL — slicing must be invisible. Scale: the ledger is
    * |days| rows forever; per batch one map-side-combined rollup;
    * history never reshuffles. */
  def s61StreamXmr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s61_xmr", dir),
      Seq("g" -> R.q57Daily(ev.filter(lit(false)))),
      eventSlices(ev)) { (st, b, _) =>
      Seq(anomalyFoldBatch(st(0), b))
    }
    R.q71Present(fin(0))
  }

  /** s61's oracle IS q71's batch chart. Lazy per the s45Sql
    * stance. */
  lazy val s61Sql: String = graft.operators.Relational.q71Sql

  /** s62: the LIVE forecast-skill monitor — q72 kept current over
    * the arriving event stream through persisted ledger generations:
    * the state is STILL q57's daily ledger, folded by the SAME
    * [[anomalyFoldBatch]] sum-merge (ONE ledger definition now
    * serves THREE live readouts — s57 robust z, s61 SPC limits, s62
    * forecast skill — the strongest single-definition story in the
    * family), presentation reruns the SAME q72Present: the backtest
    * re-scores in full as days close, which is exactly how a
    * forecast dashboard re-baselines. The oracle IS q72's batch
    * SQL — slicing must be invisible. Scale: ledger |days| rows
    * forever, per batch one map-side rollup. */
  def s62StreamForecast(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s62_forecast", dir),
      Seq("g" -> R.q57Daily(ev.filter(lit(false)))),
      eventSlices(ev)) { (st, b, _) =>
      Seq(anomalyFoldBatch(st(0), b))
    }
    R.q72Present(fin(0))
  }

  /** s62's oracle IS q72's batch backtest. Lazy per the s45Sql
    * stance. */
  lazy val s62Sql: String = graft.operators.Relational.q72Sql

  /** s63's per-micro-batch state fold: the live session table.
    * State = q69's session rows so far (one OPEN session per user —
    * the row with the user's max session_idx — plus closed history).
    * A batch folds in with q69's exact gap rule: the open session's
    * last-event timestamp seeds the user's lag chain (the s51
    * open-row induction — between events the gap test only needs the
    * PREVIOUS event's ts, and for the batch's first event that is
    * exactly the open session's end), a relative cumsum numbers the
    * batch's sessions from the open index (rel 0 = the batch
    * CONTINUES the open session: starts stay, counts add; rel ≥ 1 =
    * new sessions), untouched rows pass through. Exact under the
    * event-time-ordered precondition (the s50/s51 witness stance —
    * every batch event is later than every state event, so the open
    * session's end is the true predecessor of the batch's first).
    * Scale: per batch one user-keyed window over (1 seed row per
    * user ∪ batch) — batch-sized, never history — plus user-keyed
    * joins against the OPEN slice (one row per user, bucketable);
    * closed rows are append-only and never reshuffle. */
  def sessionsFoldBatch(closed: DataFrame, open: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val R = graft.operators.Relational
    // the OPEN slice is already one row per active user — no window
    // over history anywhere in this fold (review finding: the
    // earlier single-table form ranked the ENTIRE state per batch)
    val seed = open.select(col("user_id"),
      col("session_end").as("ts"), lit(-1L).as("event_id"),
      lit(null).cast("string").as("event_type"), lit(true).as("is_seed"))
    val ev = batch.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"), lit(false).as("is_seed"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = seed.unionByName(ev)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s", when(col("is_seed"), 0L)
        .otherwise(when(col("prev_us").isNull ||
          col("us") - col("prev_us") > lit(R.q69GapUs), 1L).otherwise(0L)))
      .withColumn("rel", sum(col("new_s")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(!col("is_seed"))
    val touched = flagged
      .join(open.select(col("user_id"), col("session_idx").as("open_idx"),
        col("session_start").as("open_start"),
        col("events").as("open_events"),
        col("purchases").as("open_purch")), Seq("user_id"), "left")
      .withColumn("session_idx",
        (coalesce(col("open_idx"), lit(0)) + col("rel")).cast("int"))
      .groupBy("user_id", "session_idx", "open_idx", "open_start",
        "open_events", "open_purch")
      .agg(min(col("ts")).as("bstart"), max(col("ts")).as("bend"),
        count(lit(1)).as("bev"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("bpur"))
      .select(col("user_id"), col("session_idx"),
        when(col("session_idx") === col("open_idx"), col("open_start"))
          .otherwise(col("bstart")).as("session_start"),
        col("bend").as("session_end"),
        (when(col("session_idx") === col("open_idx"), col("open_events"))
          .otherwise(lit(0L)) + col("bev")).as("events"),
        (when(col("session_idx") === col("open_idx"), col("open_purch"))
          .otherwise(lit(0L)) + col("bpur")).as("purchases"),
        col("open_idx"))
    // per touched user: the LAST batch session stays open; earlier
    // ones close (a window over the batch's OWN sessions, never
    // history)
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_idx").desc)
    val marked = touched.withColumn("is_last", row_number().over(wLast) === 1)
    val sessCols = Seq("user_id", "session_idx", "session_start",
      "session_end", "events", "purchases")
    val newOpen = marked.filter(col("is_last")).select(sessCols.map(col): _*)
    val nowClosed = marked.filter(!col("is_last")).select(sessCols.map(col): _*)
    val touchedUsers = touched.select("user_id").distinct()
    // a touched user whose open session was NOT continued closes it
    // verbatim; untouched users keep their open rows
    val superseded = open
      .join(touchedUsers, Seq("user_id"), "left_semi")
      .join(touched.filter(col("session_idx") === col("open_idx"))
        .select("user_id"), Seq("user_id"), "left_anti")
    val stillOpen = open.join(touchedUsers, Seq("user_id"), "left_anti")
    (closed.unionByName(nowClosed).unionByName(superseded),
      stillOpen.unionByName(newOpen))
  }

  /** Present the dual session state (closed ∪ open) as q69's output
    * (duration derives from the stored start/end — state never
    * carries a redundant column). */
  def sessionsPresent(closed: DataFrame, open: DataFrame): DataFrame =
    closed.unionByName(open).select(col("user_id"), col("session_idx"),
      col("session_start"), col("session_end"), col("events"),
      expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000")
        .as("duration_sec"),
      col("purchases"))
      .orderBy("user_id", "session_idx")

  /** s63: the LIVE session table — q69 kept current over the
    * arriving event stream through persisted DUAL state generations
    * (the s45/s50 stance via the shared foldGenerations driver; the
    * s53/s55 dual-artifact shape), completing the batch/stream
    * sessionization pair from the other side (s36 sessionizes the
    * stream windowed; s63 maintains q69's SESSION TABLE): the OPEN
    * state is one row per active user — the only state the fold
    * computes against — and the CLOSED state is append-only history
    * that enters no window, no join, and no shuffle (the generation
    * write re-materializes it in full — the harness's artifact form;
    * a production sink appends the batch's newly-closed rows as
    * partitions). The oracle IS q69's batch recompute — ordered
    * slicing must be invisible — and StreamingSpec drives the same
    * fold through a REAL MemoryStream + foreachBatch generation
    * chain, proving a batch boundary inside a session extends it
    * rather than splitting it. */
  def s63StreamSessions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val empty = ev.select(col("user_id"),
      lit(0).cast("int").as("session_idx"),
      col("ts").as("session_start"), col("ts").as("session_end"),
      col("event_id").as("events"), col("event_id").as("purchases"))
      .filter(lit(false))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s63_sessions", dir),
      Seq("c" -> empty, "o" -> empty), eventSlices(ev)) { (st, b, _) =>
      val (c, o) = sessionsFoldBatch(st(0), st(1), b)
      Seq(c, o)
    }
    sessionsPresent(fin(0), fin(1))
  }

  /** s63's oracle IS q69's batch session table. Lazy per the s45Sql
    * stance. */
  lazy val s63Sql: String = graft.operators.Relational.q69Sql

  /** s64's sample-state fold: bottom-k by clock over
    * (state ∪ batch) — exact by the q68/d52 bottom-k merge law and
    * IDEMPOTENT under redelivery (the s52 set stance: a re-delivered
    * doc's deterministic clock either dedups against state or
    * out-ranks out), so the fold is exact under ANY slicing — the
    * strongest replay guarantee, which is why the driver below
    * slices by doc_id RESIDUE, not time. */
  def t60SampleFold(state: DataFrame, batch: DataFrame): DataFrame = {
    val T = graft.text.TextOps
    state.unionByName(T.t60Clocked(batch)).distinct()
      .orderBy(col("clock_e15"), col("doc_id")).limit(T.t60K)
  }

  /** s64: the LIVE weighted sample — t60 kept current over an
    * arriving document stream through persisted state generations
    * (the s45/s50 stance via the shared foldGenerations driver): the
    * state is the ≤ k earliest exponential clocks seen so far, each
    * batch folds in by the bottom-k law, presentation ranks through
    * the SAME t60Present. Because clocks are deterministic functions
    * of content identity, this is reservoir sampling whose result is
    * INDEPENDENT of arrival order — proven by driving the fold over
    * doc_id-residue slices (each spanning the whole corpus,
    * interleaved) rather than time slices. The oracle IS t60's
    * batch SQL. Scale: state is k rows forever; per batch one
    * TakeOrdered bottom-k over (k ∪ batch-clocks) — per-partition
    * partials, no global sort (the r12-advice fix: the fold now
    * plans exactly like t60Present). */
  def s64StreamWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val T = graft.text.TextOps
    val empty = T.t60Clocked(docs.filter(lit(false)))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s64_wsample", dir),
      Seq("g" -> empty),
      Seq(
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 === 1),
        docs.filter(col("doc_id") % 3 === 2))) { (st, b, _) =>
      Seq(t60SampleFold(st(0), b))
    }
    T.t60Present(fin(0))
  }

  /** s64's oracle IS t60's batch sample. Lazy per the s45Sql
    * stance. */
  lazy val s64Sql: String = graft.text.TextOps.t60Sql

  /** s65's guarded fold: the foreachBatch IDEMPOTENT-SINK contract.
    * State is (ledger, txn): the data table plus a transaction log
    * holding one row per committed batch id (the Delta txn-log
    * shape). A batch folds in ONLY if its id is absent from the log;
    * a replayed id is a structural NO-OP — both artifacts pass
    * through untouched. The guard consults the log with a bounded
    * metadata read (|committed batches| rows, never a data scan) —
    * exactly what a production writer does before committing a
    * micro-batch to an external table. The data fold itself is
    * s57's [[anomalyFoldBatch]] day-keyed sum-merge — deliberately
    * the NON-idempotent fold class (sums double-count on
    * redelivery), because that is the class the guard exists for:
    * the set-based folds (s52/s64) survive replay by algebra, the
    * sum-merges only by this contract. */
  private[graft] def s65GuardedFold(ledger: DataFrame, txn: DataFrame,
      batch: DataFrame, batchId: Long): Seq[DataFrame] = {
    val seen = txn.filter(col("batch_id") === batchId).limit(1).count() > 0
    if (seen) Seq(ledger, txn)
    else Seq(
      anomalyFoldBatch(ledger, batch),
      txn.unionByName(txn.sparkSession.range(1)
        .select(lit(batchId).as("batch_id"))))
  }

  /** s65's delivery schedule: the three standard event slices with
    * the MIDDLE batch delivered twice under the same id — the
    * at-least-once redelivery every production sink faces. */
  private[graft] def s65Deliveries(ev: DataFrame): Seq[(Long, DataFrame)] = {
    val sl = eventSlices(ev)
    Seq(0L -> sl(0), 1L -> sl(1), 1L -> sl(1), 2L -> sl(2))
  }

  /** s65: exactly-once sink semantics — the streaming family proves
    * fold == batch under slicing and row redelivery; THIS entry
    * proves a replayed whole BATCH is a no-op through a batch-id
    * transaction ledger (the foreachBatch idempotent-sink contract).
    * The daily purchase ledger (q57's rollup — a sum-merge, NOT
    * idempotent by algebra) folds through [[foldGenerations]] with
    * batch 1 deliberately delivered twice; the guard skips the
    * replay, so the oracle — the plain batch rollup over the full
    * stream — only matches if the duplicate was genuinely dropped
    * (a failed guard double-counts every overlap day and the gate
    * hash catches it). StreamingSpec additionally pins
    * replay-is-identity state-for-state and that the UNGUARDED fold
    * does diverge. Scale: the guard is an O(|batches|) metadata
    * read per commit; the data path is s57's bounded day-keyed
    * sum-merge. */
  def s65ExactlyOnce(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val R = graft.operators.Relational
    val deliveries = s65Deliveries(ev)
    val emptyLedger = R.q57Daily(ev.filter(lit(false)))
    val emptyTxn = s.range(0).select(col("id").as("batch_id"))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s65_once", dir),
      Seq("g" -> emptyLedger, "l" -> emptyTxn),
      deliveries.map(_._2)) { (st, b, i) =>
      s65GuardedFold(st(0), st(1), b, deliveries(i)._1)
    }
    fin(0).orderBy("day")
  }

  /** s65's oracle: the daily purchase rollup over the FULL stream —
    * a correct exactly-once sink is invisible to the report. */
  val s65Sql: String =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS purchases
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** s66's per-customer batch rollup: last order date (max-merge),
    * order count (sum-merge), spend in integer cents (sum-merge —
    * the q60 discipline: float sums are order-sensitive across
    * slicings, integer sums are not, which is what makes this fold
    * byte-exact under ANY batch boundary). */
  private[graft] def s66BatchRollup(ord: DataFrame): DataFrame =
    ord.groupBy(col("o_custkey").as("cust_key"))
      .agg(to_date(max(col("o_orderdate"))).as("last_odate"),
        count(lit(1)).as("frequency"),
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("cents"))

  /** s66's state fold: customer-keyed exact merge (max date, two
    * integer sums) — associative and commutative, so the ledger is
    * slicing-independent (the s57 sum-merge stance, customer-keyed).
    * State is one row per customer seen so far. */
  def rfmFoldBatch(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(s66BatchRollup(batch))
      .groupBy("cust_key")
      .agg(max(col("last_odate")).as("last_odate"),
        sum(col("frequency")).as("frequency"),
        sum(col("cents")).as("cents"))

  /** s66's readout: the live customer state scored through q45b's
    * shared boundary machinery — rank-quantile quintiles over the
    * state's own population (integer metrics end to end), q45's
    * shared segment rule. */
  private[graft] def s66Present(state: DataFrame): DataFrame = {
    val R = graft.operators.Relational
    val per = state.select(col("cust_key"),
      datediff(lit("2001-09-01").cast("date"), col("last_odate"))
        .as("recency_days"),
      col("frequency"),
      col("cents").as("monetary"))
    val scored = R.q45bApplyScores(
      per.crossJoin(broadcast(R.q45bWide(per, "x"))),
      "x", ("r_score", "f_score", "m_score"))
    scored.select(col("cust_key"), col("recency_days"), col("frequency"),
      col("monetary").as("monetary_cents"),
      col("r_score"), col("f_score"), col("m_score"),
      R.q45Segment(col("r_score"), col("f_score"), col("m_score"))
        .as("segment"))
      .orderBy("cust_key")
  }

  /** s66: LIVE RFM — q45 kept current over the arriving order stream
    * (the segmentation a marketing platform actually serves: scores
    * move as orders land, not on a nightly batch): per batch one
    * customer-keyed exact merge (max date + two integer sums — the
    * q60 cents discipline makes the fold byte-exact under any
    * slicing); presentation scores the state through q45b's shared
    * rank-quantile boundary pass and q45's shared segment rule.
    * Scale: state is one row per customer; per batch the merge
    * exchanges |batch customers| rows; the boundary pass at serving
    * is three sorts over the state — at 100 TB you swap in q45b's
    * bottom-k sampled boundaries, the documented register swap that
    * is now CODE (q45b), not prose. */
  def s66StreamRfm(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s66_rfm", dir),
      Seq("g" -> s66BatchRollup(ord.filter(lit(false)))),
      orderSlices(ord)) { (st, b, _) =>
      Seq(rfmFoldBatch(st(0), b))
    }
    s66Present(fin(0))
  }

  /** DuckDB oracle for s66: the cents-based rollup straight off the
    * full order table, the SAME q45b boundary SQL builders, the
    * SAME segment CASE — slicing must be invisible. LAZY per the
    * s45Sql stance (an eager val here runs during the
    * Relational↔Streaming object-init cycle and bakes nulls into
    * the SQL). */
  lazy val s66Sql: String = {
    val R = graft.operators.Relational
    s"""WITH per AS (
       | SELECT o_custkey AS cust_key,
       |  CAST(datediff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS INT)
       |    AS recency_days,
       |  count(*) AS frequency,
       |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
       |   AS monetary
       | FROM orders GROUP BY 1),
       |${R.q45bProbesCte},
       |stx AS (${R.q45bStackSql("per")}),
       |qx AS (${R.q45bQSql("stx")}),
       |wx AS (${R.q45bWideSql("qx", "x")}),
       |scored AS (
       | SELECT cust_key, recency_days, frequency, monetary,
       |  CAST(5 - len(list_filter(rbx, x -> recency_days > x)) AS INT) AS r_score,
       |  CAST(1 + len(list_filter(fbx, x -> frequency > x)) AS INT) AS f_score,
       |  CAST(1 + len(list_filter(mbx, x -> monetary > x)) AS INT) AS m_score
       | FROM per, wx)
       |SELECT cust_key, recency_days, frequency, monetary AS monetary_cents,
       | r_score, f_score, m_score,
       | ${R.q45SegmentSql("r_score", "f_score", "m_score")} AS segment
       |FROM scored ORDER BY cust_key""".stripMargin
  }

  /** s67's sketch fold: bottom-k by gram over (state ∪ batch grams)
    * — EXACT by the q68/d52 bottom-k merge law and IDEMPOTENT under
    * redelivery (set algebra), so the live sketch equals the batch
    * sketch under ANY slicing. */
  def overlapSketchFold(state: DataFrame, grams: DataFrame): DataFrame =
    state.unionByName(grams).distinct()
      .orderBy("gram").limit(graft.dedup.Dedup.d52K)

  /** s67's exact-leg fold: the distinct gram SET per corpus — the
    * s53 set stance (union-distinct, idempotent); the declared gate
    * instrument dropped at production scale where only the k-row
    * sketches fold. */
  def overlapSetFold(state: DataFrame, grams: DataFrame): DataFrame =
    state.unionByName(grams).distinct()

  /** s67: LIVE corpus overlap — d52 kept current over an arriving
    * document stream: per batch the batch's grams split by corpus
    * parity fold into four artifacts (two exact gram sets — the
    * gate legs; two k-row bottom-k sketches — the product), and
    * presentation assembles d52's exact-vs-estimate row through the
    * SAME d52PairFrame/d52MetricCols bodies. The driver slices by
    * doc_id RESIDUE (the s64 stance: interleaved, order-free) —
    * every fold is idempotent set algebra, so the strongest replay
    * guarantee holds. The oracle IS d52's batch SQL. Scale: sketch
    * state is k rows per corpus forever; the exact sets are the
    * declared d52/s53 gate trade. */
  def s67StreamOverlap(s: SparkSession, dir: String): DataFrame = {
    val D = graft.dedup.Dedup
    val docs = Tables.documents(s, dir)
    val emptyG = D.d52GramsOf(docs.filter(lit(false))).select("gram")
    val slices = Seq(0, 1, 2).map(r => docs.filter(col("doc_id") % 3 === r))
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s67_overlap", dir),
      Seq("a" -> emptyG, "b" -> emptyG, "sa" -> emptyG, "sb" -> emptyG),
      slices) { (st, b, _) =>
      val g = D.d52GramsOf(b)
      val ga = g.filter(col("doc_id") % 2 === 0).select("gram").distinct()
      val gb = g.filter(col("doc_id") % 2 =!= 0).select("gram").distinct()
      Seq(overlapSetFold(st(0), ga), overlapSetFold(st(1), gb),
        overlapSketchFold(st(2), ga), overlapSketchFold(st(3), gb))
    }
    D.d52PairFrame(fin(0), fin(1), fin(2), fin(3))
      .select(D.d52MetricCols: _*)
  }

  /** s67's oracle IS d52's batch overlap. Lazy per the s45Sql
    * stance. */
  lazy val s67Sql: String = graft.dedup.Dedup.d52Sql

  /** s68's sink loop, exposed for the spec: run the micro-batch
    * appends, returning the layout dir and the file count after
    * each batch (the pathology's growth curve), then compact.
    * Returns (perBatchFileCounts, compaction run). */
  private[graft] def s68Build(s: SparkSession, dir: String)
      : (Seq[Long], graft.sources.Export.Q75Run) = {
    val E = graft.sources.Export
    val ev = Tables.events(s, dir)
    val out = E.scratch("s68_sink", dir)
    E.deleteTree(out) // append accumulates across same-JVM reruns
    val growth = eventSlices(ev).map { b =>
      // the foreachBatch sink shape: each batch APPENDS its rows into
      // the day-partitioned serving layout — several writer tasks per
      // batch, so every day directory gains a handful of small files
      // per batch: the pathology q75 exists for, accumulating live
      b.select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts"), col("ts").cast("date").as("day"))
        .repartition(8, col("event_id"))
        .write.mode("append").partitionBy("day").parquet(out)
      E.countParquetFiles(out)
    }
    (growth, E.q75CompactLayout(s, out, E.scratch("s68_opt", dir), "day"))
  }

  /** s68: scheduled OPTIMIZE inside the ingest loop — the q75
    * compactor applied to the layout a LIVE sink actually produces:
    * three micro-batches append into a day-partitioned table (one+
    * new file per day per batch — the real foreachBatch small-files
    * accumulation), then the shared [[graft.sources.Export
    * .q75CompactLayout]] bin-packs it (closed-form file-count
    * target, fail-stop requires). The oracle is the daily rollup
    * over the FULL stream: neither the append accumulation nor the
    * compaction may be visible to a reader. Scale: the appends are
    * O(batch) each (no old file rewritten); the compaction is q75's
    * one partition-keyed shuffle, run on whatever schedule the
    * file-count growth curve (spec-pinned monotone) dictates. */
  def s68StreamCompaction(s: SparkSession, dir: String): DataFrame = {
    val run = s68Build(s, dir)._2
    s.read.parquet(run.outDir)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("events"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("value_cents"))
      .orderBy("day")
  }

  /** s68's oracle: the daily rollup straight off the events table. */
  val s68Sql: String =
    """SELECT CAST(ts AS DATE) AS day, count(*) AS events,
      | CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
      |  AS value_cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** s69's sink builder, exposed for the spec: the first order
    * micro-batch appends WITHOUT the channel column; the writer then
    * upgrades mid-stream and batches 2–3 append WITH it — the live
    * form of q80's one-shot backfill. Returns (layout, v1 files). */
  private[graft] def s69Build(s: SparkSession, dir: String)
      : (String, Seq[String]) = {
    val E = graft.sources.Export
    val ord = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val out = E.scratch("s69_evo", dir)
    E.deleteTree(out) // append accumulates across same-JVM reruns
    val slices = orderSlices(ord)
    slices.head.write.mode("append").parquet(out)
    val v1Files = E.listParquet(out)
    slices.tail.foreach { b =>
      b.withColumn("o_channel", E.q80Channel(col("o_orderkey")))
        .write.mode("append").parquet(out)
    }
    (out, v1Files)
  }

  /** s69: schema evolution MID-STREAM — q80's append-with-new-column
    * contract exercised the way it actually happens in production: a
    * foreachBatch writer is upgraded between micro-batches and starts
    * emitting the new column while the sink already holds
    * old-schema files from earlier batches; nothing is rewritten
    * (the spec pins the batch-1 file set byte-untouched), and the
    * reader is the SAME [[graft.sources.Export.q80EvolvedRead]] face
    * q80 uses — a reader must not care whether evolution arrived by
    * backfill or mid-stream. Oracle: the channel derivation replayed
    * off the source with the pre-upgrade slice CASE'd to 'legacy'
    * (the slice boundary IS [[orderSlices]]'s first cut). Scale: the
    * upgrade is O(0) on existing data — only the footer-schema union
    * at read planning; each append stays O(batch). */
  def s69StreamSchemaEvolution(s: SparkSession, dir: String): DataFrame =
    graft.sources.Export.q80EvolvedRead(s, s69Build(s, dir)._1)

  /** s69's oracle: the evolved rollup off the source, the
    * pre-upgrade slice owned as 'legacy'. */
  val s69Sql: String =
    """SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  THEN 'legacy'
      |  ELSE 'ch_' || CAST(o_orderkey % 3 AS VARCHAR) END AS channel,
      | count(*) AS orders,
      | CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |  AS cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** s70's ingest loop, exposed for the spec: three order
    * micro-batches append into the lookup table; after EACH append
    * the bloom sidecar is maintained by scanning ONLY the listing
    * diff's fresh files (the q79 incremental-manifest idiom applied
    * to q82's bloom — appends create files, never modify them, so a
    * (file, word) bloom row can never span batches and the union is
    * exact by construction). Returns (layout, final sidecar path,
    * per-batch file counts). */
  private[graft] def s70Build(s: SparkSession, dir: String)
      : (String, String, Seq[Int]) = {
    val E = graft.sources.Export
    val ord = Tables.orders(s, dir)
      .withColumn("o_hash", md5(col("o_orderkey").cast("string").cast("binary")))
    val out = E.scratch("s70_bloom", dir)
    E.deleteTree(out) // append accumulates across same-JVM reruns
    var known = Seq.empty[String]
    var side = ""
    val growth = orderSlices(ord).zipWithIndex.map { case (b, i) =>
      b.repartition(4, col("o_orderkey"))
        .write.mode("append").parquet(out)
      val files = E.listParquet(out)
      val fresh = files.diff(known)
      require(fresh.nonEmpty, s"s70: batch $i appended no files")
      known = files
      // the maintenance step: old sidecar ∪ the fresh files' bloom
      // rows — O(new rows) scan + O(set bits) metadata, never a
      // table re-scan (each version is its own artifact so the
      // read-build-overwrite race never arises)
      val fresh2 = E.q82SidecarRows(s, fresh)
      val next = s"${out}_sidecar_v$i"
      (if (i == 0) fresh2 else s.read.parquet(side).unionByName(fresh2))
        .coalesce(1).write.mode("overwrite").parquet(next)
      side = next
      files.size
    }
    (out, side, growth)
  }

  /** s70: live bloom-index maintenance — q82's point-lookup sidecar
    * kept current INSIDE the ingest loop (q79 maintains min/max stats
    * incrementally; a real table's bloom index needs the same
    * per-append upkeep or point lookups degrade to full scans as the
    * table grows): each micro-batch appends, the sidecar unions in
    * only the new files' bloom rows, and the registered face probes
    * the full table through the final incrementally-built sidecar via
    * the SAME [[graft.sources.Export.q82ProbeFiles]]/q82Face path.
    * Oracle IS q82's (all batches union to the whole table and a
    * correct sidecar is invisible to the reader — the q79/q42
    * shared-oracle stance). StreamingSpec pins incremental ==
    * full-rebuild row-for-row, monotone file growth, pruning
    * engagement, and face == q82's registered output. Scale: upkeep
    * per batch is O(batch rows) + O(#files) metadata; the probe
    * reads ~1 file no matter how many batches accumulated. */
  def s70StreamSkipping(s: SparkSession, dir: String): DataFrame = {
    val E = graft.sources.Export
    val (out, side, _) = s70Build(s, dir)
    val (rows, kept, total) = E.q82ProbeFiles(s, out, side,
      E.q82LookupHash(s, dir))
    require(kept < total,
      s"s70: bloom must prune ($kept of $total files kept)")
    E.q82Face(rows)
  }

  /** s71's allowed-lateness delay (days) and the planted straggler
    * residue: every %17 event arrives one trigger after its
    * event-time slice — deterministic out-of-order delivery, so both
    * engines can replay the arrival schedule exactly. */
  private[graft] val s71DelayDays = 3
  private[graft] val s71Straggler = 17L

  /** Arrival batches for the late-data fold: an event's arrival
    * trigger is its event-time slice index ([[s50Cut1]]/[[s50Cut2]] —
    * the eventSlices boundaries), pushed one trigger later for
    * stragglers and capped at the last trigger. */
  private[graft] def s71Arrivals(ev: DataFrame): Seq[DataFrame] = {
    val sliceIdx = when(col("ts") < lit(s50Cut1), 0)
      .when(col("ts") < lit(s50Cut2), 1).otherwise(2)
    val arr = least(
      sliceIdx + when(col("event_id") % s71Straggler === 0, 1).otherwise(0),
      lit(2))
    (0 to 2).map(i => ev.filter(arr === lit(i)))
  }

  /** Per-day event counts — the rollup both the on-time ledger and
    * the dead-letter ledger fold through. */
  private[graft] def s71Daily(ev: DataFrame): DataFrame =
    ev.groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))

  private def s71Merge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("day").agg(sum("n").as("n"))

  /** s71: late-data accounting — the watermark contract every
    * production stream ships but no entry yet PROVED (s34–s70 all
    * consume in-order slices; real streams deliver stragglers, and
    * Structured Streaming's answer is the global watermark: state
    * older than max-event-time-seen minus the allowed lateness is
    * closed, and a row arriving below the watermark must be ROUTED,
    * not silently merged or silently dropped): the fold carries an
    * on-time daily ledger, a dead-letter ledger, and the 1-row
    * max-seen timestamp; each trigger classifies its batch against
    * the watermark DERIVED FROM PREVIOUS TRIGGERS ONLY (trigger 0 has
    * no watermark — everything is on time, exactly Spark's
    * per-trigger watermark update rule), routes late rows to the DLQ
    * ledger, and advances max-seen. Stragglers arriving within the
    * allowed lateness are absorbed on-time (the spec pins both: real
    * late drops AND real absorbed stragglers). The face joins both
    * ledgers per day; oracle = the arrival schedule + running-max
    * watermark replayed in SQL, byte-exact.
    *
    * Scale: state is |days| + |days| + 1 rows; per trigger the
    * classification is one broadcast 1-row watermark cross into the
    * batch scan (the q28 scalar stance), the merges day-keyed
    * sum-merges — nothing ranks, nothing replays history. */
  def s71StreamLateData(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val stateDir = graft.sources.Export.scratch("s71_state", dir)
    val led0 = s71Daily(ev.filter(lit(false)))
    val dlq0 = s71Daily(ev.filter(lit(false)))
    val wm0 = s.range(1).select(lit(null).cast("timestamp").as("max_seen"))
    val out = foldGenerations(s, stateDir,
      Seq("s71led" -> led0, "s71dlq" -> dlq0, "s71wmk" -> wm0),
      s71Arrivals(ev)) { case (states, batch, _) =>
      val Seq(led, dlq, wmk) = states: @unchecked
      val wm = wmk.select(
        (col("max_seen") - expr(s"INTERVAL $s71DelayDays DAYS")).as("wm"))
      val cls = batch.crossJoin(broadcast(wm))
        .withColumn("late", coalesce(col("ts") < col("wm"), lit(false)))
      val led2 = s71Merge(led, s71Daily(cls.filter(!col("late"))))
      val dlq2 = s71Merge(dlq, s71Daily(cls.filter(col("late"))))
      // greatest() skips NULLs, so the gen-0 null max-seen never
      // poisons the running maximum
      val wm2 = wmk.crossJoin(broadcast(batch.agg(max("ts").as("bmax"))))
        .select(greatest(col("max_seen"), col("bmax")).as("max_seen"))
      Seq(led2, dlq2, wm2)
    }
    out(0).withColumnRenamed("n", "ontime")
      .join(out(1).withColumnRenamed("n", "late"), Seq("day"), "full_outer")
      .select(col("day"), coalesce(col("ontime"), lit(0L)).as("ontime"),
        coalesce(col("late"), lit(0L)).as("late"))
      .orderBy("day")
  }

  /** DuckDB oracle for s71: the identical arrival schedule, the
    * running-max watermark over strictly-earlier triggers, and the
    * same strict-less late rule. */
  val s71Sql: String =
    s"""WITH b AS (
       | SELECT *, LEAST(
       |  (CASE WHEN ts < TIMESTAMP '$s50Cut1 00:00:00' THEN 0
       |        WHEN ts < TIMESTAMP '$s50Cut2 00:00:00' THEN 1 ELSE 2 END)
       |  + (CASE WHEN event_id % $s71Straggler = 0 THEN 1 ELSE 0 END),
       |  2) AS arr
       | FROM events),
       |wm AS (SELECT arr, max(ts) AS mx FROM b GROUP BY 1),
       |wmc AS (SELECT arr, max(mx) OVER (ORDER BY arr
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |  - INTERVAL $s71DelayDays DAY AS wm FROM wm),
       |cl AS (
       | SELECT b.*, coalesce(b.ts < wmc.wm, FALSE) AS late
       | FROM b JOIN wmc USING (arr))
       |SELECT CAST(ts AS DATE) AS day,
       | CAST(count(*) FILTER (NOT late) AS BIGINT) AS ontime,
       | CAST(count(*) FILTER (late) AS BIGINT) AS late
       |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin

  /** s72's dimension arrival slices: c_custkey residues mod 3 — the
    * customer stream's own micro-batches, interleaved with the order
    * stream's time slices so every generation delivers BOTH a fact
    * delta and a dim delta (the two-stream shape q88 maintains in
    * one batch refresh). */
  private[graft] def s72CustSlices(cust: DataFrame, n: Int): Seq[DataFrame] =
    (0 until n).map(r => cust.filter(col("c_custkey") % n === r))

  /** s72: LIVE join-MV — q88's delta-join algebra as a two-stream
    * fold (the Structured Streaming stream-stream join MV, the shape
    * `orders.join(customers)` + agg plans under watermarked state):
    * each generation delivers an order slice AND a customer slice;
    * the fold runs q88's three legs against the CURRENT states —
    * ΔA⋈B_state ∪ A_state⋈ΔB ∪ ΔA⋈ΔB — then advances all three
    * artifacts (A-state as (custkey, year) partials — the compressed
    * join state that makes retaining a 100 TB fact stream feasible;
    * B-state as the customers seen; the MV as mergeable partials).
    * A customer arriving in generation 2 picks up generations 0–1's
    * order history through the A_state⋈ΔB leg — the cross-generation
    * property StreamingSpec pins, along with fold == the unsplit
    * recompute and A-state boundedness (one row per customer-year,
    * never per order). The oracle IS q88's full join + rollup —
    * slicing must be invisible (the s45/q38 stance).
    *
    * Scale: per generation the legs broadcast dimension-sized frames
    * only; nothing re-joins history against history; every merge is
    * a map-side-combinable sum at MV grain. */
  def s72StreamJoinMv(s: SparkSession, dir: String): DataFrame = {
    val R = graft.operators.Relational
    val ord = Tables.orders(s, dir)
    val cust = R.q88Custs(s, dir)
    val batches = orderSlices(ord)
    // the dim stream's arity is DERIVED from the fact stream's, so a
    // change to orderSlices can never index out of the customer
    // slices (review-pass finding)
    val custSlices = s72CustSlices(cust, batches.length)
    val aInit = R.q88APartials(ord.filter(lit(false)))
    val bInit = cust.filter(lit(false))
    val mvInit = R.q88Leg(aInit, bInit)
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s72_jmv", dir),
      Seq("a" -> aInit, "b" -> bInit, "m" -> mvInit),
      batches) { (st, batch, i) =>
      val Seq(aState, bState, mv) = st: @unchecked
      val da = R.q88APartials(batch)
      val db = custSlices(i)
      val delta = R.q88MvMerge(Seq(
        R.q88Leg(da, bState), R.q88Leg(aState, db), R.q88Leg(da, db)))
      Seq(R.q88AMerge(aState, da), bState.unionByName(db),
        R.q88MvMerge(Seq(mv, delta)))
    }
    fin(2).orderBy("segment", "o_year")
  }

  /** s72's oracle IS q88's full join recompute. Lazy per the s45Sql
    * stance. */
  lazy val s72Sql: String = graft.operators.Relational.q88Sql

  /** s73: the LIVE FIFO meter — q90's lot attribution kept current
    * over the arriving event stream (the billing shape: charges must
    * post as consumption happens, not in a nightly batch). The fold
    * carries four artifacts: OPEN lot intervals (cents not yet
    * consumed — the inventory backlog), OPEN draw intervals (demand
    * not yet supplied — the overdraft backlog), per-user running
    * totals (the positional offsets), and the append-only pairs
    * LEDGER. Each trigger: the batch's events become intervals at
    * the user's current offsets; new allocations are exactly
    * new-draws × (open ∪ new lots) plus new-lots × open-draws —
    * both through q90's ONE [[graft.operators.Relational
    * .q90PairsFrom]] intersection body — and both backlogs shrink by
    * the closed intervals (an interval leaves the open set the
    * moment the OTHER stream's total passes its end). The ledger is
    * union-append and never re-enters a shuffle (the s63
    * closed-history stance). The oracle IS q90's batch SQL —
    * slicing must be invisible to the attribution.
    *
    * Scale: state is backlog-sized (open intervals — bounded by how
    * far supply and demand diverge, not by history) plus one totals
    * row per user; per trigger the intersection joins touch batch ×
    * backlog, never history × history. */
  def s73StreamFifo(s: SparkSession, dir: String): DataFrame = {
    val R = graft.operators.Relational
    val ev = Tables.events(s, dir)
    val lInit = R.q90Lots(ev.filter(lit(false)))
    val dInit = R.q90Draws(ev.filter(lit(false)))
    val tInit = ev.filter(lit(false)).select(col("user_id"))
      .withColumn("lc", lit(0L)).withColumn("dc", lit(0L))
    val pInit = R.q90PairsFrom(lInit, dInit)
    val fin = foldGenerations(s,
      graft.sources.Export.scratch("s73_fifo", dir),
      Seq("l" -> lInit, "d" -> dInit, "t" -> tInit, "p" -> pInit),
      eventSlices(ev)) { (st, batch, _) =>
      val Seq(openLots, openDraws, totals, ledger) = st: @unchecked
      // batch intervals, shifted to the user's running offsets
      val newLots = R.q90Lots(batch)
        .join(totals.select("user_id", "lc"), Seq("user_id"), "left")
        .select(col("user_id"), col("lot_id"),
          (col("l_lo") + coalesce(col("lc"), lit(0L))).as("l_lo"),
          (col("l_hi") + coalesce(col("lc"), lit(0L))).as("l_hi"))
      val newDraws = R.q90Draws(batch)
        .join(totals.select("user_id", "dc"), Seq("user_id"), "left")
        .select(col("user_id"), col("draw_id"),
          (col("d_lo") + coalesce(col("dc"), lit(0L))).as("d_lo"),
          (col("d_hi") + coalesce(col("dc"), lit(0L))).as("d_hi"))
      val allLots = openLots.unionByName(newLots)
      val allDraws = openDraws.unionByName(newDraws)
      val fresh = R.q90PairsFrom(allLots, newDraws)
        .unionByName(R.q90PairsFrom(newLots, openDraws))
      // advance totals by the batch's per-user cents
      val t2 = totals
        .join(newLots.groupBy("user_id").agg(max("l_hi").as("nl")),
          Seq("user_id"), "full_outer")
        .join(newDraws.groupBy("user_id").agg(max("d_hi").as("nd")),
          Seq("user_id"), "full_outer")
        .select(col("user_id"),
          greatest(coalesce(col("nl"), lit(0L)), coalesce(col("lc"), lit(0L)))
            .as("lc"),
          greatest(coalesce(col("nd"), lit(0L)), coalesce(col("dc"), lit(0L)))
            .as("dc"))
      // an interval closes when the OTHER stream's total passes its end
      val l2 = allLots.join(t2.select(col("user_id"), col("dc")),
          Seq("user_id"), "left")
        .filter(col("l_hi") > coalesce(col("dc"), lit(0L)))
        .select("user_id", "lot_id", "l_lo", "l_hi")
      val d2 = allDraws.join(t2.select(col("user_id"), col("lc")),
          Seq("user_id"), "left")
        .filter(col("d_hi") > coalesce(col("lc"), lit(0L)))
        .select("user_id", "draw_id", "d_lo", "d_hi")
      Seq(l2, d2, t2, ledger.unionByName(fresh))
    }
    fin(3).orderBy("user_id", "lot_id", "draw_id")
  }

  /** s73's oracle IS q90's. Lazy per the s45Sql stance. */
  lazy val s73Sql: String = graft.operators.Relational.q90Sql

  /** s74's head version (the three q77 change windows). */
  private[graft] val s74Head = 3

  /** s74's builder: fold the q77 change windows as live micro-batches
    * maintaining TWO artifacts per trigger — the latest snapshot MV
    * (incrementally, snap ∪ batch through the ONE
    * [[applyChangesSnapshot]] rule: the s42 merge) and the
    * append-only VERSIONED change ledger (each batch stamped with its
    * commit version). Every generation of both persists
    * (snap0..3 / ledg0..3 under the state dir), so the spec can audit
    * snapshot ≡ ledger-replay at every version. */
  private[graft] def s74Build(s: SparkSession, dir: String,
      tag: String = "s74_asof"): String = {
    val R = graft.operators.Relational
    val ev = Tables.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val cuts = R.q77Cutoffs
    val base = applyChangesSnapshot(ev.filter(col("ts") <= lit(cuts(0))))
    val batches = (1 to s74Head).map { k =>
      if (k < s74Head)
        ev.filter(col("ts") > lit(cuts(k - 1)) && col("ts") <= lit(cuts(k)))
      else ev.filter(col("ts") > lit(cuts(s74Head - 1)))
    }
    val stateDir = graft.sources.Export.scratch(tag, dir)
    val ledger0 = ev.filter(lit(false)).withColumn("version", lit(0))
    foldGenerations(s, stateDir,
      Seq("s74snap" -> base, "s74ledg" -> ledger0), batches) {
      case (states, batch, i) =>
        val Seq(snap, ledg) = states: @unchecked
        Seq(applyChangesSnapshot(snap.unionByName(batch)),
          ledg.unionByName(batch.withColumn("version", lit(i + 1))))
    }
    stateDir
  }

  /** Serve AS OF version k from the LIVE ledger: the genesis
    * snapshot artifact plus the ledger's commits ≤ k, replayed
    * through the ONE latest-per-key rule — q77's read, pointed at
    * state a stream maintains instead of a written chain. */
  private[graft] def s74AsOf(s: SparkSession, stateDir: String, k: Int): DataFrame =
    applyChangesSnapshot(
      s.read.parquet(s"$stateDir/s74snap0").unionByName(
        s.read.parquet(s"$stateDir/s74ledg$s74Head")
          .filter(col("version") <= k).drop("version")))

  /** s74: LIVE AS OF serving — the streaming face of the q77 chain
    * (r13 verdict #6), completing the table-format stream family
    * (s68 compaction, s69 schema evolution, s70 skipping, s71
    * watermarks, s65 exactly-once — and now versioned reads): a
    * stream that maintains the CURRENT snapshot per trigger must
    * also be able to answer "the table as of commit k" from its own
    * change ledger, or time travel only exists for batch-written
    * tables. The fold keeps both artifacts live; the registered face
    * serves the MIDDLE version 2 from the ledger, so its oracle IS
    * q77's direct-snapshot SQL (the q78 shared-oracle stance: a live
    * ledger must be indistinguishable from a written chain).
    * StreamingSpec pins the stronger closure: at EVERY version, the
    * incrementally-maintained snapshot artifact == the ledger replay
    * == the direct snapshot at that cutoff, artifact-level including
    * tombstones.
    *
    * Scale: per trigger the MV merge is the s42 one-shuffle apply
    * and the ledger append is O(batch); an AS OF read is one bounded
    * union + one latest-per-key window — identical cost to q77's,
    * with q92's checkpoint cadence available unchanged (the snapshot
    * generations ARE per-commit checkpoints). */
  def s74StreamAsof(s: SparkSession, dir: String): DataFrame =
    applyServing(s74AsOf(s,
      graft.BuildCache.build(s"s74:$dir")(s74Build(s, dir)), 2))

  /** s74's oracle IS q77's (the live ledger serves the same middle
    * version q77's written chain serves). Lazy per the s45Sql
    * stance. */
  lazy val s74Sql: String = graft.operators.Relational.q77Sql

  /** s75's version window over the s74 chain: base to the middle
    * version — wide enough that inserts and both update images all
    * populate. */
  private[graft] val s75From = 0
  private[graft] val s75To = 2

  /** The live between-versions feed off an s74 state dir: the
    * window's net state is one latest-per-key pass over the LEDGER
    * rows with version in (k1, k2] (never the table), the k1
    * pre-image is the maintained snapshot GENERATION k1 (tombstones
    * in-band — the artifact the fold already wrote), and the
    * classification is the ONE [[graft.operators.Relational
    * .cdfFromNet]] body q93 uses on written chains. */
  private[graft] def s75Feed(s: SparkSession, stateDir: String,
      k1: Int, k2: Int): DataFrame = {
    val net = applyChangesSnapshot(
      s.read.parquet(s"$stateDir/s74ledg$s74Head")
        .filter(col("version") > k1 && col("version") <= k2)
        .drop("version"))
    graft.operators.Relational.cdfFromNet(net,
      s.read.parquet(s"$stateDir/s74snap$k1"))
  }

  /** s75: LIVE change data feed — q93's streaming face, closing the
    * CDC square (s42 applies a feed, q35 recovers one from
    * snapshots, q93 reads one from a written chain's logs, s75
    * serves one from the ledger a STREAM maintains): a consumer that
    * missed triggers (k1, k2] asks the streaming MV for exactly
    * those changes, and the answer comes from the fold's own
    * artifacts — the versioned ledger for the window's net state,
    * the snapshot generation k1 for the pre-image — through the ONE
    * classification body. Oracle: the q35-shape snapshot diff at the
    * two version cutoffs (a ledger-served feed must be
    * indistinguishable from diffing the snapshots it connects);
    * StreamingSpec quantifies that equivalence over every version
    * pair on the s74 chain.
    *
    * Scale: the net pass touches ledger rows in the window (O(Δ)),
    * the pre-image is a state-sized artifact read restricted to
    * changed keys inside [[cdfFromNet]] — nothing replays history,
    * nothing diffs two table-sized snapshots. */
  def s75StreamCdf(s: SparkSession, dir: String): DataFrame =
    s75Feed(s,
      graft.BuildCache.build(s"s75:$dir")(s74Build(s, dir, "s75_asof")),
      s75From, s75To)

  /** DuckDB oracle for s75: the shared [[graft.operators.Relational
    * .cdfSql]] body at the window's version cutoffs (one SQL
    * definition for both feed forms — review-pass finding). Lazy per
    * the s45Sql stance. */
  lazy val s75Sql: String = {
    val cuts = graft.operators.Relational.q77Cutoffs
    graft.operators.Relational.cdfSql(cuts(s75From), cuts(s75To))
  }

  /** s76's builder: run the WAP protocol as a live fold — each
    * micro-batch stages itself as a REAL artifact, the audit runs on
    * the staged files (never the table, never the in-flight plan),
    * and publish unions the audited artifact into the table state.
    * States: the published table and the append-only attempts
    * ledger; every generation of both persists for the spec's
    * byte-level reject audit. Returns the state dir. */
  private[graft] def s76Build(s: SparkSession, dir: String): String = {
    import s.implicits._
    val R = graft.operators.Relational
    val (base, batches) = R.q96Batches(s, dir)
    val stateDir = graft.sources.Export.scratch("s76_wap", dir)
    val writers = batches.map(_._1)
    val ledger0 = Seq.empty[(Int, String, Long, Long, String, Int, Long)]
      .toDF("attempt", "writer", "staged_rows", "violations",
        "decision", "version_after", "published_rows_after")
    foldGenerations(s, stateDir,
      Seq("s76tab" -> base, "s76ledg" -> ledger0), batches.map(_._2)) {
      case (states, batch, i) =>
        val Seq(tab, ledg) = states: @unchecked
        // stage the batch as a real artifact; audit EXACTLY that
        val staged = s"$stateDir/staged_${i + 1}"
        batch.write.mode("overwrite").parquet(staged)
        val a = s.read.parquet(staged).agg(count(lit(1)),
          sum(when(expr(R.q96GateConj), 0L).otherwise(1L))).head
        val (n, viol) = (a.getLong(0), a.getLong(1))
        // prior version off the persisted ledger (≤ i rows — bounded)
        val prevV = ledg.agg(coalesce(max("version_after"), lit(0))).head.getInt(0)
        val tab2 = if (viol == 0L) tab.unionByName(s.read.parquet(staged)) else tab
        val published = tab2.count()
        val row = Seq((i + 1, writers(i), n, viol,
          if (viol == 0L) "published" else "rejected",
          if (viol == 0L) prevV + 1 else prevV, published))
          .toDF("attempt", "writer", "staged_rows", "violations",
            "decision", "version_after", "published_rows_after")
        Seq(tab2, ledg.unionByName(row))
    }
    stateDir
  }

  /** s76: LIVE WRITE-AUDIT-PUBLISH — q96's streaming face, closing
    * the ingest-gate square (q40 meters rows, s47 meters them live,
    * q96 gates batch commits, s76 gates the STREAM's own commits): a
    * foreachBatch sink that appends blindly turns one poisoned
    * micro-batch into a poisoned table, so each trigger stages its
    * batch as a real artifact, audits the staged files with the ONE
    * q40 rule table, and only a zero-violation batch joins the table
    * state — the planted codec-bug batch is rejected with the table
    * state untouched (the spec pins generation k == generation k−1
    * across the reject, row-identical). The face is the live
    * attempts ledger; its oracle IS q96's batch SQL — a stream
    * running the protocol must be indistinguishable from the batch
    * WAP (the s74/s73 shared-oracle stance). Fail-stops mirror
    * q96's: the rejection genuinely bit, and the final table count
    * equals the ledger's last published total.
    *
    * Scale: per trigger the audit is one conditional-sum scan of the
    * BATCH; the ledger append is O(1); a reject costs zero table
    * I/O. The union-append table state stands in for q96's O(#files)
    * file adoption — at a real sink the publish is the same metadata
    * move q96 does. */
  def s76StreamWap(s: SparkSession, dir: String): DataFrame = {
    // the head generation is the protocol's own batch count — never
    // a literal (the q89-advice precondition stance)
    val head = graft.operators.Relational
      .q96Batches(s, dir)._2.size
    val stateDir = graft.BuildCache.build(s"s76:$dir")(s76Build(s, dir))
    val out = s.read.parquet(s"$stateDir/s76ledg$head").orderBy("attempt")
    val rows = out.collect()
    require(rows.count(_.getString(4) == "rejected") == 1 &&
      rows.exists(_.getLong(3) > 0L),
      "s76: the planted audit failure must genuinely reject")
    val tableN = s.read.parquet(s"$stateDir/s76tab$head").count()
    require(tableN == rows.last.getLong(6),
      s"s76: table holds $tableN rows, ledger says ${rows.last.getLong(6)}")
    out
  }

  /** s76's oracle IS q96's (a live WAP must be indistinguishable
    * from the batch protocol). Lazy per the s45Sql stance. */
  lazy val s76Sql: String = graft.operators.Relational.q96Sql

  /** s77's builder: live merge-on-read — the table's data files are
    * written ONCE (the q76 range-clustered layout); DELETE commands
    * then arrive as micro-batches and the fold maintains the
    * deletion-vector sidecar as its only state, appending O(matches)
    * (file, pos) rows per trigger and never reopening a data file.
    * Each command is a 1-row (lo, hi) key-span frame (how a CDC
    * delete arrives: a predicate, not positions — the fold resolves
    * it against the layout's own scan). Returns (layout, stateDir,
    * #commands). */
  private[graft] def s77Build(s: SparkSession, dir: String)
      : (String, String, Int) = {
    import s.implicits._
    val E = graft.sources.Export
    val layout = E.scratch("s77_mor", dir)
    E.q76ClusterWrite(Tables.orders(s, dir), layout, "overwrite")
    val ((d1lo, d1hi), (d2lo, d2hi)) = E.q95Spans(s, dir)
    val cmds = Seq((d1lo, d1hi), (d2lo, d2hi))
      .map(c => Seq(c).toDF("lo", "hi"))
    val stateDir = E.scratch("s77_dv", dir)
    val dv0 = s.read.parquet(layout)
      .select(E.q95FileId.as("file"),
        col("_metadata.row_index").as("pos"))
      .filter(lit(false))
    foldGenerations(s, stateDir, Seq("dv" -> dv0), cmds) {
      case (states, cmd, _) =>
        val Seq(dv) = states: @unchecked
        val span = cmd.head() // the 1-row delete command — bounded
        val fresh = s.read.parquet(layout)
          .select(E.q95FileId.as("file"),
            col("_metadata.row_index").as("pos"), col("o_orderkey"))
          .filter(col("o_orderkey").between(span.getLong(0), span.getLong(1)))
          .select("file", "pos")
        Seq(dv.unionByName(fresh))
    }
    (layout, stateDir, cmds.size)
  }

  /** s77: LIVE DELETION VECTORS — q95's streaming face, the missing
    * live leg of the table-format stream family (s68 compacts, s70
    * maintains skipping sidecars, s71 accounts late data; none can
    * DELETE): a stream that receives CDC delete commands must apply
    * them merge-on-read — an O(matches) vector append per trigger —
    * because rewriting data files inside a trigger would turn every
    * delete into a table-sized write stall. The fold's only state is
    * the vector sidecar; the face serves the post-stream MOR read
    * through the ONE [[graft.sources.Export.q95MorRead]] body
    * (pointed at the live state instead of a written commit dir) and
    * rolls it up with q95's face, so its oracle IS q95's
    * predicate-complement SQL — a stream-maintained vector must be
    * indistinguishable from the batch commit chain. StreamingSpec
    * pins the per-version closure: at EVERY generation the MOR read
    * equals the direct predicate complement of the commands applied
    * so far, and the vector state grows append-only.
    *
    * Scale: per trigger one predicate scan of the layout (at a real
    * table pruned by q76/q82 skipping first) emits matches only; the
    * MOR read anti-joins dirty files against a broadcast
    * metadata-sized vector; clean files never pay the join. */
  def s77StreamMor(s: SparkSession, dir: String): DataFrame = {
    val E = graft.sources.Export
    val (layout, stateDir, n) =
      graft.BuildCache.build(s"s77:$dir")(s77Build(s, dir))
    val (rows, dirty, total) = E.q95MorRead(s, layout, s"$stateDir/dv$n")
    require(dirty > 0 && dirty < total,
      s"s77: merge-on-read must leave clean files ($dirty/$total dirty)")
    E.q95Face(rows)
  }

  /** s77's oracle IS q95's (the live vector serves the same
    * survivors the batch lifecycle serves — s77 stops before the
    * purge, which q95 proves invisible to the read). Lazy per the
    * s45Sql stance. */
  lazy val s77Sql: String = graft.sources.Export.q95Sql

  /** s78's builder: live record-index maintenance — the table starts
    * from the first order slice, append batches land as new part
    * files, and the fold extends the (key, file) index state by
    * scanning ONLY the trigger's new files (listed by the
    * before/after file diff — O(#files) driver metadata, the
    * q75/q87 stance). The data files and every index generation
    * persist for the spec's incremental == rebuild audit. Returns
    * (layout, stateDir, #batches). */
  private[graft] def s78Build(s: SparkSession, dir: String)
      : (String, String, Int) = {
    val E = graft.sources.Export
    val layout = E.scratch("s78_layout", dir)
    E.deleteTree(layout)
    val slices = orderSlices(Tables.orders(s, dir))
    // every commit range-clusters ITS OWN rows on the index key (the
    // q76 ingest discipline q101's one-shot layout gets for free):
    // time-sliced commits with no within-commit clustering would put
    // every key range in every file and no lookup could prune
    E.q76ClusterWrite(slices.head, layout, "overwrite")
    val idx0 = s.read.parquet(layout)
      .select(col("o_orderkey").as("key"), E.q95FileId.as("file"))
    val stateDir = E.scratch("s78_idx", dir)
    foldGenerations(s, stateDir, Seq("idx" -> idx0), slices.tail) {
      case (states, batch, _) =>
        val Seq(idx) = states: @unchecked
        val before = E.listParquet(layout).toSet
        E.q76ClusterWrite(batch, layout, "append")
        val fresh = (E.listParquet(layout).toSet -- before).toSeq.sorted
        val newRows = s.read.parquet(fresh: _*)
          .select(col("o_orderkey").as("key"), E.q95FileId.as("file"))
        Seq(idx.unionByName(newRows))
    }
    (layout, stateDir, slices.size - 1)
  }

  /** s78: LIVE RECORD INDEX — q101's streaming face, completing the
    * sidecar-maintenance square (s70 keeps the bloom sidecar live on
    * append, s68 re-points the manifest across compaction, s77
    * appends delete vectors; the exact key→file index gets the same
    * discipline): each append trigger indexes ONLY its own new files
    * — O(batch) index I/O, never a table re-scan — and a point
    * lookup through the live index state must be indistinguishable
    * from q101's built-once index over the final table. The face
    * runs q101's probe (same span-derived modulus, same kept-file
    * read, same zero-false-positive instrument) against the
    * stream-maintained state; its oracle IS q101's SQL.
    * StreamingSpec pins the closures: the final index state equals a
    * from-scratch rebuild row-for-row, and at EVERY generation the
    * indexed keys are exactly the data-so-far's keys.
    *
    * Scale: the per-trigger index append scans only new files
    * (16 bytes/row out); the file-diff listing is O(#files) driver
    * metadata; lookups are q101's shape unchanged. An index that
    * required rebuild-on-append would turn every micro-batch into a
    * table scan — this is why record indexes ship as incrementally
    * maintained sidecars (Hudi's metadata-table record index). */
  def s78StreamRecordIndex(s: SparkSession, dir: String): DataFrame = {
    val E = graft.sources.Export
    val (layout, stateDir, n) =
      graft.BuildCache.build(s"s78:$dir")(s78Build(s, dir))
    val m = E.q101ProbeMod(s, dir)
    val probes = Tables.orders(s, dir)
      .filter(col("o_orderkey") % m === 0)
      .select(col("o_orderkey").as("key"))
    val kept = s.read.parquet(s"$stateDir/idx$n")
      .join(broadcast(probes), Seq("key"))
      .select("file").distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    val paths = E.q95PathOf(layout)
    require(kept.nonEmpty && kept.length < paths.size,
      s"s78: live index must prune (${kept.length} of ${paths.size} files kept)")
    val scanned = s.read.parquet(kept.map(paths): _*)
    val hit = scanned.filter(col("o_orderkey") % m === 0)
      .select(E.q95FileId).distinct().count()
    require(hit == kept.length,
      s"s78: ${kept.length} files kept but only $hit hold a match")
    E.q82Face(scanned.join(broadcast(probes),
      col("o_orderkey") === col("key"), "left_semi"))
  }

  /** s78's oracle IS q101's (a live index must serve the lookup a
    * built-once index serves). Lazy per the s45Sql stance. */
  lazy val s78Sql: String = graft.sources.Export.q101Sql

  /** s79's builder: fold the event slices maintaining the
    * pseudonymized profile MV at its MERGEABLE grain — one row per
    * (pseudo, event_type) carrying (n, cents). The grain matters:
    * q98's face needs a DISTINCT type count, which per-pseudo
    * partials cannot merge, but at (pseudo, type) grain the distinct
    * count is exactly the row count and every measure is an additive
    * long (the q38 partial-aggregate stance). Returns the state
    * dir. */
  private[graft] def s79Build(s: SparkSession, dir: String): String = {
    val R = graft.operators.Relational
    val ev = Tables.events(s, dir)
    def partials(batch: DataFrame): DataFrame =
      batch.groupBy(R.q98Pseudo(col("user_id")).as("pseudo"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
    val init = partials(ev.filter(lit(false)))
    val stateDir = graft.sources.Export.scratch("s79_mv", dir)
    foldGenerations(s, stateDir, Seq("s79st" -> init), eventSlices(ev)) {
      case (states, batch, _) =>
        val Seq(st) = states: @unchecked
        Seq(st.unionByName(partials(batch))
          .groupBy("pseudo", "event_type")
          .agg(sum("n").as("n"), sum("cents").as("cents")))
    }
    stateDir
  }

  /** s79: LIVE PSEUDONYMIZED PROFILES — q98's streaming face (the
    * privacy family's live leg, the s78/s76 discipline applied to
    * the release path): the published per-pseudonym activity profile
    * is maintained per trigger instead of recomputed per release,
    * and the ONE [[graft.operators.Relational.q98Pseudo]] key
    * definition guarantees the property batch pseudonymization gets
    * for free but streams must EARN — the same user arriving in
    * different triggers lands under the same pseudonym, so partials
    * merge by key and linkage never fragments. State lives at the
    * (pseudo, event_type) grain where every measure is additive and
    * the distinct-type count is a row count; the face rolls up and
    * joins the pseudonymized dim exactly like q98, with q98's
    * linkage/collision fail-stops re-checked against the STREAM's
    * own output. Oracle IS q98's SQL — a maintained profile must be
    * indistinguishable from the batch release. StreamingSpec pins
    * the generation closure: state at every trigger equals the
    * partials of the data-so-far.
    *
    * Scale: per trigger one keyed exchange over the BATCH's
    * partials merged against MV-sized state (never history);
    * pseudonymization itself is the same codegen'd projection as
    * q98 — zero added shuffles over the un-pseudonymized fold. */
  def s79StreamPseudonymize(s: SparkSession, dir: String): DataFrame = {
    val R = graft.operators.Relational
    val stateDir = graft.BuildCache.build(s"s79:$dir")(s79Build(s, dir))
    // head generation = the slice count, never a literal (the s76
    // review-finding stance)
    val head = eventSlices(Tables.events(s, dir)).size
    val st = s.read.parquet(s"$stateDir/s79st$head")
    val fact = st.groupBy("pseudo")
      .agg(sum("n").as("n_events"), count(lit(1)).as("n_types"),
        sum("cents").as("value_cents"))
    val dim = Tables.customer(s, dir)
      .select(R.q98Pseudo(col("c_custkey")).as("pseudo"),
        col("c_mktsegment").as("mktsegment"))
    val out = fact.join(broadcast(dim), Seq("pseudo"))
      .select("pseudo", "mktsegment", "n_events", "n_types", "value_cents")
      .orderBy("pseudo")
    val ev = Tables.events(s, dir)
    val r = ev.agg(countDistinct(col("user_id")), count(lit(1))).head
    val got = out.agg(count(lit(1)), sum("n_events")).head
    require(got.getLong(0) == r.getLong(0),
      s"s79: ${got.getLong(0)} pseudonyms for ${r.getLong(0)} users — " +
        "the stream fragmented or merged a linkage")
    require(got.getLong(1) == r.getLong(1),
      s"s79: profile covers ${got.getLong(1)} of ${r.getLong(1)} events")
    out
  }

  /** s79's oracle IS q98's (a maintained profile must be
    * indistinguishable from the batch release). Lazy per the s45Sql
    * stance. */
  lazy val s79Sql: String = graft.operators.Relational.q98Sql

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s34_stream_tumbling" -> (s34StreamTumbling _),
    "s35_stream_join" -> (s35StreamJoin _),
    "s36_sessionize" -> (s36Sessionize _),
    "s37_cumulative" -> (s37Cumulative _),
    "s38_stream_dedup" -> (s38StreamDedup _),
    "s39_stream_decontaminate" -> (s39StreamDecontaminate _),
    "s40_stream_pii" -> (s40StreamPii _),
    "s41_stream_quality" -> (s41StreamQuality _),
    "s42_apply_changes" -> (s42ApplyChanges _),
    "s43_stream_index_dedup" -> (s43StreamIndexDedup _),
    "s44_stream_neardup_admit" -> (s44StreamNeardupAdmit _),
    "s45_stream_mv_refresh" -> (s45StreamMvRefresh _),
    "s46_stream_card" -> (s46StreamCard _),
    "s47_stream_expectations" -> (s47StreamExpectations _),
    "s48_stream_semantic_admit" -> (s48StreamSemanticAdmit _),
    "s49_stream_heavy_hitters" -> (s49StreamHeavyHitters _),
    "s50_stream_funnel" -> (s50StreamFunnel _),
    "s51_stream_scd2" -> (s51StreamScd2 _),
    "s52_stream_retention" -> (s52StreamRetention _),
    "s53_stream_hll" -> (s53StreamHll _),
    "s54_stream_transitions" -> (s54StreamTransitions _),
    "s55_stream_profile" -> (s55StreamProfile _),
    "s56_stream_attribution" -> (s56StreamAttribution _),
    "s57_stream_anomaly" -> (s57StreamAnomaly _),
    "s58_stream_psi" -> (s58StreamPsi _),
    "s59_stream_benford" -> (s59StreamBenford _),
    "s60_stream_quantiles" -> (s60StreamQuantiles _),
    "s61_stream_xmr" -> (s61StreamXmr _),
    "s62_stream_forecast" -> (s62StreamForecast _),
    "s63_stream_sessions" -> (s63StreamSessions _),
    "s64_stream_weighted_sample" -> (s64StreamWeightedSample _),
    "s65_exactly_once" -> (s65ExactlyOnce _),
    "s66_stream_rfm" -> (s66StreamRfm _),
    "s67_stream_overlap" -> (s67StreamOverlap _),
    "s68_stream_compaction" -> (s68StreamCompaction _),
    "s69_stream_schema_evolution" -> (s69StreamSchemaEvolution _),
    "s70_stream_skipping" -> (s70StreamSkipping _),
    "s71_stream_late_data" -> (s71StreamLateData _),
    "s72_stream_join_mv" -> (s72StreamJoinMv _),
    "s73_stream_fifo" -> (s73StreamFifo _),
    "s74_stream_asof" -> (s74StreamAsof _),
    "s75_stream_cdf" -> (s75StreamCdf _),
    "s76_stream_wap" -> (s76StreamWap _),
    "s77_stream_mor" -> (s77StreamMor _),
    "s78_stream_record_index" -> (s78StreamRecordIndex _),
    "s79_stream_pseudonymize" -> (s79StreamPseudonymize _),
    "s80_stream_left_join" -> (s80StreamLeftJoin _))

  def oracles: Map[String, String] = Map(
    "s34_stream_tumbling" -> s34Sql,
    "s35_stream_join" -> s35Sql,
    "s36_sessionize" -> s36Sql,
    "s37_cumulative" -> s37Sql,
    "s38_stream_dedup" -> s38Sql,
    "s39_stream_decontaminate" -> s39Sql,
    "s40_stream_pii" -> s40Sql,
    "s41_stream_quality" -> s41Sql,
    "s42_apply_changes" -> s42Sql,
    "s43_stream_index_dedup" -> s43Sql,
    "s44_stream_neardup_admit" -> s44Sql,
    "s45_stream_mv_refresh" -> s45Sql,
    "s46_stream_card" -> s46Sql,
    "s47_stream_expectations" -> s47Sql,
    "s48_stream_semantic_admit" -> s48Sql,
    "s49_stream_heavy_hitters" -> s49Sql,
    "s50_stream_funnel" -> s50Sql,
    "s51_stream_scd2" -> s51Sql,
    "s52_stream_retention" -> s52Sql,
    "s53_stream_hll" -> s53Sql,
    "s54_stream_transitions" -> s54Sql,
    "s55_stream_profile" -> s55Sql,
    "s56_stream_attribution" -> s56Sql,
    "s57_stream_anomaly" -> s57Sql,
    "s58_stream_psi" -> s58Sql,
    "s59_stream_benford" -> s59Sql,
    "s60_stream_quantiles" -> s60Sql,
    "s61_stream_xmr" -> s61Sql,
    "s62_stream_forecast" -> s62Sql,
    "s63_stream_sessions" -> s63Sql,
    "s64_stream_weighted_sample" -> s64Sql,
    "s65_exactly_once" -> s65Sql,
    "s66_stream_rfm" -> s66Sql,
    "s67_stream_overlap" -> s67Sql,
    "s68_stream_compaction" -> s68Sql,
    "s69_stream_schema_evolution" -> s69Sql,
    // s70 answers q82's lookup over the same (appended) table through
    // the incrementally-maintained bloom sidecar — a correct sidecar
    // is invisible to the reader
    "s70_stream_skipping" -> graft.sources.Export.q82Sql,
    "s71_stream_late_data" -> s71Sql,
    // s72 answers q88's join rollup over the same two (sliced)
    // streams — slicing must be invisible to the MV
    "s72_stream_join_mv" -> s72Sql,
    // s73 answers q90's attribution over the same (sliced) stream —
    // slicing must be invisible to the pair ledger
    "s73_stream_fifo" -> s73Sql,
    "s74_stream_asof" -> s74Sql,
    "s75_stream_cdf" -> s75Sql,
    // s76 runs q96's protocol live over the same batches — a
    // streaming WAP must be indistinguishable from the batch gate
    "s76_stream_wap" -> s76Sql,
    // s77 serves q95's survivors from a stream-maintained vector —
    // and stops before the purge q95 proves invisible
    "s77_stream_mor" -> s77Sql,
    // s78 serves q101's lookup through the incrementally-maintained
    // index — a live sidecar must be invisible to the reader
    "s78_stream_record_index" -> s78Sql,
    // s79 maintains q98's release profile live — a maintained MV
    // must be indistinguishable from the batch release
    "s79_stream_pseudonymize" -> s79Sql,
    "s80_stream_left_join" -> s80Sql)
}
