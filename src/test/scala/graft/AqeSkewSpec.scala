package graft

import org.apache.spark.sql.functions._

/** Runtime evidence for the dedup family's "beyond the cap-handled
  * extreme, AQE's skew join handles moderately-hot buckets"
  * assertion (Dedup.scala's band-hash candidate equi-join).
  *
  * The capped variant anti-joins out buckets above maxBucket; a
  * bucket below the cap but far above the median still lands its
  * whole band-hash partition on one task under plain hash
  * partitioning. At cluster scale Spark's OptimizeSkewedJoin splits
  * that partition into multiple tasks at RUNTIME — this spec proves
  * the mechanism fires on a band-shaped join by lowering the skew
  * thresholds to local-data magnitudes (the 256 MB/5× defaults are
  * sized for executors, not a 4-core test JVM; the REPLAN is what's
  * being pinned, not the threshold values). */
class AqeSkewSpec extends SparkSpec {

  test("AQE skew-join splits a hot band bucket at runtime (skew=true in the executed plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot band bucket (60k member docs, well under any
      // realistic cap relative to corpus size) among 60 cold ones —
      // the d23/d25b candidate-join shape: (band_hash, doc) ⋈ bucket
      val docs = (0 until 66000).map { i =>
        val bucket = if (i < 60000) 0L else 1L + i % 60
        (bucket, i.toLong, s"payload-$i-${"x" * 40}")
      }.toDF("band_hash", "doc_id", "body")
      val buckets = (0L to 60L).map(b => (b, s"bucket-$b")).toDF("band_hash", "tag")
      // aggregate over body so the wide column crosses the join
      // shuffle — column pruning must not shrink the hot partition
      // below the skew threshold (shuffle sizes are what AQE reads)
      val joined = docs.join(buckets, "band_hash")
        .groupBy("tag").agg(count("*").as("n"), sum(length(col("body"))).as("chars"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 66000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot bucket's join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
