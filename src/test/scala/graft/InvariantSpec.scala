package graft

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

  test("d27 components partition the corpus: every doc appears once, one keeper per component") {
    val out = SparkEntry.queries("d27_dedup_components")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.count() == docs)
    val perComponent = out.groupBy("component_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"))
      .filter(col("keepers") =!= 1).count()
    assert(perComponent == 0, "exactly one kept doc per component")
  }
}
