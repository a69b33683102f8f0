package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/debug runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def audit(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"=== $name ===")
      println("  broadcasts: " + plan.linesIterator.count(_.contains("BroadcastHashJoin")))
      println("  shuffles:   " + plan.linesIterator.count(_.contains("Exchange")))
      println("  codegen spans: " + plan.linesIterator.count(_.contains("WholeStageCodegen")))
      fmt.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(6).foreach(l => println("  " + l.trim.take(150)))
    }
    Seq("q01_agg_filter", "q03_join_enrich", "q04_multiway_left_join",
      "q11_range_join", "q12_double_entry", "d23_dedup_minhash",
      "a27_ann_brute").foreach(audit)
    spark.stop()
  }
}
