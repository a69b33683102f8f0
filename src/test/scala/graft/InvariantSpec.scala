package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-query invariants on real data — properties the oracle gate
  * can't express because both engines could be wrong together. */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q13 event indexes are globally unique across types and shards") {
    val idx = SparkEntry.queries("q13_event_index")(spark, sfDir)
      .select("event_index")
    assert(idx.count() == idx.distinct().count(),
      "every event must get a unique index")
  }

  test("q25 as-of join emits every purchase exactly once") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val out = SparkEntry.queries("q25_asof_join")(spark, sfDir)
    assert(out.count() == purchases)
    assert(out.select("purchase_id").distinct().count() == purchases)
  }

  test("q28 date spine is complete: every user has every day exactly once") {
    val out = SparkEntry.queries("q28_date_spine")(spark, sfDir)
    val users = out.select("user_id").distinct().count()
    val days = out.select("event_date").distinct().count()
    assert(out.count() == users * days,
      "spine must be the full user × day cross product")
  }

  test("q32 SCD2 on handcrafted changes: collapse, windows, versions, current flag") {
    // ts written as long nanos — the same physical shape the driver's
    // events table has, so Tables.events' nanos→micros path is exercised
    val dir = java.nio.file.Files.createTempDirectory("graftevents").toString
    Seq( // (event_id, user_id, event_type, ts_sec)
      (1L, 1L, "signup", 100L),
      (2L, 1L, "signup", 200L),   // consecutive dup: must collapse into v1
      (3L, 1L, "purchase", 300L),
      (4L, 1L, "signup", 400L),   // back to signup: a NEW version, not merged
      (5L, 2L, "error", 150L))
      .toDF("event_id", "user_id", "event_type", "ts_sec")
      .withColumn("ts", col("ts_sec") * 1000000000L)
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .drop("ts_sec")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q32_scd2")(spark, dir)
      .select(col("user_id"), col("version"), col("attr_value"),
        col("valid_from").cast("long"), col("valid_to").cast("long"),
        col("is_current"))
      .as[(Long, Int, String, Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set(
      (1L, 1, "signup", 100L, Some(300L), false),
      (1L, 2, "purchase", 300L, Some(400L), false),
      (1L, 3, "signup", 400L, None, true),
      (2L, 1, "error", 150L, None, true)))
  }

  test("q32 SCD2 invariants: one open version per user, chained windows, no repeated consecutive attr") {
    val out = SparkEntry.queries("q32_scd2")(spark, sfDir).cache()
    try {
      val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
      assert(out.filter(col("is_current")).count() == users,
        "exactly one open version per user")
      val w = Window.partitionBy("user_id").orderBy("version")
      val chained = out
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .withColumn("next_ver", lead(col("version"), 1).over(w))
        .withColumn("next_attr", lead(col("attr_value"), 1).over(w))
      assert(chained.filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from")).count() == 0,
        "each version's valid_to must equal the next version's valid_from")
      assert(chained.filter(col("next_from").isNull &&
        col("valid_to").isNotNull).count() == 0,
        "only the open tail may have a NULL valid_to")
      assert(chained.filter(col("next_ver").isNotNull &&
        col("next_ver") =!= col("version") + 1).count() == 0,
        "versions are consecutive from 1")
      assert(chained.filter(col("next_attr").isNotNull &&
        col("next_attr") === col("attr_value")).count() == 0,
        "consecutive versions must differ (dup collapse)")
    } finally { out.unpersist(): Unit }
  }

  test("d27 components partition the corpus: every doc appears once, one keeper per component") {
    val out = SparkEntry.queries("d27_dedup_components")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.count() == docs)
    val perComponent = out.groupBy("component_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"))
      .filter(col("keepers") =!= 1).count()
    assert(perComponent == 0, "exactly one kept doc per component")
  }

  test("q35 change feed closes the CDC loop: v1 + diff == v2, images pair up") {
    import graft.streaming.Streaming
    import graft.operators.Relational
    def snapshot(pre: Boolean): Set[(Long, Long, String, Double)] = {
      val ev = Tables.events(spark, sfDir)
      val src = if (pre) ev.filter(col("ts") <= lit(Streaming.s42Cutoff)) else ev
      Streaming.applyChangesSnapshot(src)
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 4))
        .as[(Long, Long, String, Double)].collect().toSet
    }
    val (v1, v2) = (snapshot(pre = true), snapshot(pre = false))
    val diff = Relational.q35SnapshotDiff(spark, sfDir)
      .as[(Long, String, Long, String, Double)].collect()
    assert(diff.nonEmpty)
    // update images arrive in pairs on the same key with different rows
    val byType = diff.groupBy(_._2)
    val pre = byType.getOrElse("update_preimage", Array.empty).map(_._1).sorted
    val post = byType.getOrElse("update_postimage", Array.empty).map(_._1).sorted
    assert(pre.toSeq == post.toSeq, "every update has both images on the same key")
    // applying the feed to v1 reproduces v2 exactly
    val removedKeys = diff.filter(r => r._2 == "delete" || r._2 == "update_preimage")
      .map(_._1).toSet
    val added = diff.filter(r => r._2 == "insert" || r._2 == "update_postimage")
      .map(r => (r._1, r._3, r._4, r._5)).toSet
    val reconstructed = v1.filterNot(r => removedKeys(r._1)) ++ added
    assert(reconstructed == v2, "v1 + change feed must reconstruct v2")
    // and the feed is minimal: no unchanged rows leak through
    diff.filter(_._2 == "update_preimage").foreach { r =>
      assert(v2.exists(x => x._1 == r._1 && x._2 != r._3),
        s"preimage for key ${r._1} must differ from the v2 row")
    }
  }
}
