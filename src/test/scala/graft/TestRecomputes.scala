package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-built ground-truth recomputes shared across spec files, so a
  * definition change cannot leave one spec pinned against a stale
  * copy (review-pass finding: the q88 unsplit recompute existed
  * verbatim in ExportSpec and StreamingSpec). These deliberately
  * live in the TEST tree — sharing them with the operators under
  * test would make the "independent" recompute circular. */
object TestRecomputes {

  /** The q88/s72 ground truth: orders ⋈ customer rolled to
    * (segment, year) with integer cents — no state/delta split on
    * either side. */
  def q88Unsplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("cents"))
      .orderBy("segment", "o_year")
}
