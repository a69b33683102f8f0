package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Drives JSON bronze ingestion in batch and file-stream mode,
  * including malformed-record rescue. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeJson(dir: String, name: String, lines: String*): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  private val good =
    """{"id":1,"ts_micros":1704103200000000,"user":{"uid":7,"segment":"pro"},"kind":"click","amount":1.5,"tags":["a","b"]}"""
  private val good2 =
    """{"id":2,"ts_micros":1704189600000000,"user":{"uid":8,"segment":"free"},"kind":"view","amount":0.5,"tags":[]}"""
  private val bad = """{"id":3,"ts_micros":"not-a-number"""

  test("batch ingestion parses the envelope, derives event_date, rescues bad rows") {
    val dir = Files.createTempDirectory("ingest").toString
    writeJson(dir, "part-0.json", good, good2, bad)
    val out = Ingest.ingestBatch(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("event_id", "ts", "user_id",
      "user_segment", "event_type", "value", "tags", "_corrupt", "is_rescued", "event_date"))
    assert(out.count() == 3)
    val r1 = out.filter(col("event_id") === 1).collect()(0)
    assert(r1.getAs[Long]("user_id") == 7L)
    assert(r1.getAs[java.sql.Date]("event_date").toString == "2024-01-01")
    assert(r1.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    // malformed row: parsed fields null, raw line preserved in _corrupt
    val corrupt = out.filter(col("_corrupt").isNotNull).collect()
    assert(corrupt.length == 1 && corrupt(0).getAs[String]("_corrupt").startsWith("""{"id":3"""))
  }

  test("is_rescued flags partially-corrupt rows and quarantine counting works") {
    val dir = Files.createTempDirectory("ingestpartial").toString
    // id/kind parse, ts_micros is a type mismatch → partial corruption
    val partial = """{"id":9,"ts_micros":"oops","user":{"uid":1,"segment":"s"},"kind":"click","amount":1.0,"tags":[]}"""
    writeJson(dir, "p.json", good, partial)
    val out = Ingest.ingestBatch(spark, dir)
    // the quarantine metric itself must be runnable (scan not pruned
    // to only the corrupt column)
    assert(out.filter(col("is_rescued")).count() == 1)
    val r = out.filter(col("event_id") === 9).collect()(0)
    assert(r.getAs[Boolean]("is_rescued"), "partial corruption must be flagged")
    assert(r.getAs[String]("_corrupt") != null)
  }

  test("file-stream ingestion picks up files incrementally") {
    val dir = Files.createTempDirectory("ingeststream").toString
    writeJson(dir, "f1.json", good)
    val q = Ingest.ingestStream(spark, dir)
      .writeStream.format("memory").queryName("ingout")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ingout").count() == 1)
      writeJson(dir, "f2.json", good2) // new file arrives
      q.processAllAvailable()
      val types = spark.table("ingout")
        .select("event_type").as[String].collect().toSet
      assert(types == Set("click", "view"))
    } finally q.stop()
  }
}
