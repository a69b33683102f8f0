package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/debug runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.dedup.Dedup.d27DedupComponents(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    println(f"TIME d27 sf0.1 ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
