package graft

import org.apache.spark.sql.SparkSession

/** Throwaway A/B measurement: does the hint-free Auto attach cost
  * anything locally vs the hard broadcast() it replaced (VERDICT r2
  * #1)? Alternates modes within one warm JVM so host-level drift
  * hits both arms equally. Test scope on purpose — not part of the
  * shipped library or the bench protocol.
  *
  * Usage: sbt "Test/runMain graft.AttachBench /root/testdata/sf0.1 3 d23"
  * (third arg: d23 = shingle attach, d28 = embedding attach)
  */
object AttachBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val entry: (SparkSession, String, dedup.Dedup.Attach) => org.apache.spark.sql.DataFrame =
      if (args.length > 2 && args(2) == "d28") dedup.Dedup.d28EmbedNeardupLshAttach
      else dedup.Dedup.d23DedupMinhashAttach
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(mode: dedup.Dedup.Attach): Double = {
      val t0 = System.nanoTime()
      entry(spark, dir, mode)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm both arms once (codegen, parquet footers)
    run(dedup.Dedup.Attach.Auto); run(dedup.Dedup.Attach.Broadcast)
    val results = (1 to reps).flatMap { i =>
      Seq("auto" -> run(dedup.Dedup.Attach.Auto),
          "bcast" -> run(dedup.Dedup.Attach.Broadcast),
          "shuffle" -> run(dedup.Dedup.Attach.Shuffle))
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (m, rs) =>
      val ts = rs.map(_._2).sorted
      println(f"$m%-8s med=${ts(ts.length / 2)}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
