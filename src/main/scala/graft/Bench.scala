package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall
  * times. Results are materialized through the noop sink so the
  * whole plan executes (a bare count() would let Catalyst prune
  * projections and skip the work being measured). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest SF so per-query times measure
    // the plan, not JIT + first-run codegen compilation. Failures are
    // tolerated — a broken input must still produce the JSON line
    // (with -1 timings), not a dead process.
    try SparkEntry.queries.get("q01_agg_filter")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    // three passes, median per query: run-to-run noise on the heavy
    // dedup queries is ±40%, so a min-of-2 can't attribute a
    // round-over-round regression; the median of three warm passes is
    // stable enough to compare across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val r1 = timeOnce(name, fn)
      val r2 = if (r1 >= 0) timeOnce(name, fn) else -1.0
      val r3 = if (r2 >= 0) timeOnce(name, fn) else -1.0
      val runs = Seq(r1, r2, r3)
      val med = if (runs.exists(_ < 0)) -1.0 else runs.sorted.apply(1)
      System.err.println(
        f"[bench] $name%-26s $med%8.2f s (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
      name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
