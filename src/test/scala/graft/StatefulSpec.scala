package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventRow, Streaming}

/** Drives the arbitrary-stateful streaming op (flatMapGroupsWithState)
  * and streaming sessionization across micro-batches. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("s37 streaming running totals keep per-user state across micro-batches") {
    val in = MemoryStream[EventRow](spark)
    val q = Streaming.runningTotalsStreaming(in.toDS())
      .writeStream.format("memory").queryName("s37out")
      .outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts(0), 1, "click", 1.5),
        EventRow(2, ts(1), 1, "click", 2.5),
        EventRow(3, ts(0), 2, "view", 10.0))
      q.processAllAvailable()
      // second micro-batch: user 1 continues from seq=2/total=4.0
      in.addData(EventRow(4, ts(2), 1, "purchase", 6.0))
      q.processAllAvailable()
      val rows = spark.table("s37out")
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(rows == Set(
        (1L, 1L, 1, 1.5), (1L, 2L, 2, 4.0), (2L, 3L, 1, 10.0),
        (1L, 4L, 3, 10.0)))
    } finally q.stop()
  }

  test("s42 apply-changes stream: out-of-order stale update loses, delete tombstones, state == batch snapshot") {
    val in = MemoryStream[EventRow](spark)
    val q = Streaming.applyChangesStream(in.toDS())
      .writeStream.format("memory").queryName("s42out")
      .outputMode("update").start()
    try {
      in.addData(
        EventRow(10, ts(5), 1, "click", 1.0),   // user 1 current
        EventRow(20, ts(3), 2, "view", 2.0),    // user 2
        EventRow(30, ts(4), 3, "signup", 3.0))  // user 3
      q.processAllAvailable()
      in.addData(
        EventRow(11, ts(1), 1, "purchase", 9.0), // STALE: older ts than event 10
        EventRow(21, ts(6), 2, "error", 0.0),    // delete marker for user 2
        EventRow(31, ts(7), 3, "view", 4.0))     // normal upsert
      q.processAllAvailable()
      // last emission per key = the live state
      val current = spark.table("s42out")
        .as[(Long, Long, String, Double, Boolean)].collect()
        .zipWithIndex.groupBy(_._1._1).map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      assert(current(1L) == ((1L, 10L, "click", 1.0, false)),
        "stale out-of-order update must not overwrite newer state")
      assert(current(2L) == ((2L, 21L, "error", 0.0, true)),
        "latest delete marker tombstones the key")
      assert(current(3L) == ((3L, 31L, "view", 4.0, false)))
      // stream state == full-recompute batch snapshot on the same rows
      val allRows = Seq(
        EventRow(10, ts(5), 1, "click", 1.0), EventRow(20, ts(3), 2, "view", 2.0),
        EventRow(30, ts(4), 3, "signup", 3.0), EventRow(11, ts(1), 1, "purchase", 9.0),
        EventRow(21, ts(6), 2, "error", 0.0), EventRow(31, ts(7), 3, "view", 4.0))
      val snap = Streaming.applyChangesSnapshot(allRows.toDS().toDF())
        .as[(Long, Long, Timestamp, String, Double)].collect()
        .map(r => r._1 -> ((r._1, r._2, r._4, r._5, r._4 == "error"))).toMap
      assert(current == snap, "streaming state must equal the batch snapshot")
    } finally q.stop()
  }

  test("s42 incremental apply equals full recompute at the test SF") {
    import org.apache.spark.sql.functions.{col, round}
    val full = Streaming.applyChangesSnapshot(Tables.events(spark, sfDir))
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4))
      .as[(Long, Long, String, Double)].collect().toSet
    val incr = Streaming.s42ApplyChanges(spark, sfDir)
      .as[(Long, Long, String, Double)].collect().toSet
    assert(incr == full, "incremental apply-changes must equal recompute from scratch")
    assert(incr.nonEmpty)
  }

  test("foreachBatch gold MERGE accumulates per-key totals across micro-batches") {
    val target = java.nio.file.Files.createTempDirectory("gold").toString + "/gold"
    val in = MemoryStream[EventRow](spark)
    val q = Streaming.goldMergeQuery(in.toDF(), target).start()
    try {
      in.addData(
        EventRow(1, ts(0), 1, "click", 2.0),
        EventRow(2, ts(1), 1, "click", 3.0),
        EventRow(3, ts(0), 2, "view", 10.0))
      q.processAllAvailable()
      in.addData(EventRow(4, ts(5), 1, "purchase", 5.0)) // user 1 accrues
      q.processAllAvailable()
      val rows = spark.read.parquet(target)
        .as[(Long, Double, Long)].collect().toSet
      assert(rows == Set((1L, 10.0, 3L), (2L, 10.0, 1L)),
        s"merged gold state wrong: $rows")
    } finally q.stop()
  }

  test("gold MERGE replayed micro-batch is skipped, not double-counted") {
    val target = java.nio.file.Files.createTempDirectory("gold2").toString + "/gold"
    val writer = Streaming.defaultGoldWriter(target)
    val b0 = Seq(EventRow(1, ts(0), 1, "click", 2.0)).toDF()
    val b1 = Seq(EventRow(2, ts(1), 1, "click", 3.0)).toDF()
    writer(b0, 0L)
    writer(b1, 1L)
    writer(b1, 1L) // at-least-once replay of the SAME batch id
    val rows = spark.read.parquet(target).as[(Long, Double, Long)].collect().toSet
    assert(rows == Set((1L, 5.0, 2L)), s"replay double-counted: $rows")
  }

  test("gold MERGE propagates a corrupt-target read failure instead of resetting totals") {
    val base = java.nio.file.Files.createTempDirectory("gold3").toString
    val target = base + "/gold"
    val writer = Streaming.defaultGoldWriter(target)
    writer(Seq(EventRow(1, ts(0), 1, "click", 2.0)).toDF(), 0L)
    // corrupt the table: replace parquet contents with garbage
    val dir = new java.io.File(target)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath, "garbage".getBytes))
    intercept[Exception] {
      writer(Seq(EventRow(2, ts(1), 1, "click", 3.0)).toDF(), 1L)
    }
    // marker (inside the table dir) was not advanced: the failed
    // batch can be retried
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target + "/_batchid")), "UTF-8").trim
    assert(marker == "0")
  }

  test("streaming dedup suppresses in-watermark duplicates, keeps distinct keys") {
    val in = MemoryStream[EventRow](spark)
    val q = Streaming.dedupStream(in.toDF(), "user_id")
      .writeStream.format("memory").queryName("dedupout")
      .outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(1), 1, "click", 2.0), // dup key within watermark
        EventRow(3, ts(2), 2, "view", 3.0))
      q.processAllAvailable()
      in.addData(EventRow(4, ts(3), 1, "click", 4.0)) // still within watermark
      q.processAllAvailable()
      val users = spark.table("dedupout")
        .select("event_id", "user_id").as[(Long, Long)].collect().toSet
      assert(users == Set((1L, 1L), (3L, 2L)),
        s"only first record per key within watermark: $users")
    } finally q.stop()
  }

  test("s36 streaming sessionization closes a session after the gap + watermark") {
    val in = MemoryStream[EventRow](spark)
    val q = Streaming.sessionizeStreaming(in.toDF())
      .writeStream.format("memory").queryName("s36out")
      .outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts(0), 1, "click", 1.0),
        EventRow(2, ts(10), 1, "click", 2.0)) // same session (gap 10min)
      q.processAllAvailable()
      // event far in the future closes the session via watermark
      in.addData(EventRow(3, Timestamp.valueOf("2024-01-01 14:00:00"), 1, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("s36out")
        .select("user_id", "session_start", "events_count", "sum_value")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((1L, ts(0), 2L, 3.0)),
        s"finalized first session expected; got $rows")
    } finally q.stop()
  }
}
