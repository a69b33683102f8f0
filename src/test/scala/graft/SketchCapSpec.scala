package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextOps

/** Specs for the scale-guard variants: hot-bucket-capped MinHash and
  * sketch statistics error bounds. */
class SketchCapSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s" + java.lang.Long.toString(0)))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("capped minhash skips the hot boilerplate bucket but keeps normal near-dups") {
    // 60 identical boilerplate docs (ids 100..159) → one hot bucket;
    // plus one small near-dup pair (1, 2)
    val boiler = (100L until 160L).map(i =>
      i -> "standard error page template content shared across the whole site")
    val near = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val dir = docsOf((boiler ++ near): _*)

    val uncapped = Dedup.d23DedupMinhash(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.d23DedupMinhashCapped(spark, dir, maxBucket = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    assert(uncapped.contains((1L, 2L)) && uncapped.exists(_._1 == 100L),
      "uncapped finds both the pair and the boilerplate cluster")
    assert(capped.contains((1L, 2L)), "capped keeps the normal near-dup pair")
    assert(!capped.exists(p => p._1 >= 100L || p._2 >= 100L),
      "capped skips every pair from the hot bucket")
    // the skipped cluster is exactly what exact dedup handles linearly
    val exact = Dedup.d22DedupExact(spark, dir)
      .filter(col("dup_count") > 1).collect()
    assert(exact.length == 1 && exact(0).getAs[Long]("dup_count") == 60L)
  }

  test("capped minhash with an infinite cap equals uncapped exactly (no pairs lost)") {
    // guards the recall contract: only pairs whose EVERY shared band
    // is hot may be lost — with no hot buckets, output is identical
    val dir = "/root/testdata/sf0.001"
    val full = Dedup.d23DedupMinhash(spark, dir)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.d23DedupMinhashCapped(spark, dir, Int.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(capped == full)
  }

  test("sketch stats: HLL distinct within 5% of exact, approx median within range") {
    val out = TextOps.t33SketchStats(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val approx = r.getAs[Long]("approx_sources").toDouble
      val exact = r.getAs[Long]("exact_sources").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"lang=${r.getString(0)}: approx=$approx exact=$exact")
      val med = r.getAs[Long]("approx_median_chars")
      assert(med > 0, "median must be positive")
    }
  }
}
