package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/debug runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("sh"))
    val sigs = docs.withColumn("mh",
      expr("transform(sequence(1,16), k -> array_min(transform(sh, t -> xxhash64(t, k))))"))
    time("signatures") {
      sigs.select("doc_id", "mh").write.format("noop").mode("overwrite").save(); 0L
    }
    val bands = sigs.select(col("doc_id"), col("mh"),
      posexplode(expr(
        """transform(sequence(0,3), b -> xxhash64(
          |  element_at(mh, 4*b+1), element_at(mh, 4*b+2),
          |  element_at(mh, 4*b+3), element_at(mh, 4*b+4)))""".stripMargin))
        .as(Seq("band_id", "band_hash")))
    val pairs = bands.as("a").join(bands.as("b"),
      col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.band_id") === graft.functions.SetExprs.firstEqualBand(col("a.mh"), col("b.mh"), 4))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("band-join pairs")(pairs.count())
    time("full d23")(graft.dedup.Dedup.d23DedupMinhash(spark, dir).count())
    time("full d25")(graft.dedup.Dedup.d25NgramJaccard(spark, dir).count())
    spark.stop()
  }
}
