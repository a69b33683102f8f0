package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Locks in the physical-plan properties the engine is designed
  * around: filter pushdown to the parquet scan, column pruning,
  * broadcast of dimension tables, and shuffle counts. These are the
  * properties that keep the plans correct at 100 TB; a regression
  * here (e.g. a lost pushdown after a refactor) would not change
  * results, only destroy scalability — exactly what result-checking
  * tests can't catch. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): (String, String) = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    (df.queryExecution.executedPlan.toString,
      df.queryExecution.explainString(FormattedMode))
  }

  test("q01 pushes the shipdate filter into the parquet scan and prunes columns") {
    val (_, fmt) = planOf("q01_agg_filter")
    assert(fmt.contains("PushedFilters"), "expected pushed filters")
    assert(fmt.contains("LessThanOrEqual(l_shipdate"), "shipdate predicate must reach the scan")
    // pruning: untouched wide columns must not be read
    assert(!fmt.contains("l_comment") && !fmt.contains("l_shipmode"),
      "unused columns must be pruned from ReadSchema")
  }

  test("q03 broadcasts both dimension tables (fact side never shuffles for the join)") {
    val (plan, _) = planOf("q03_join_enrich")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) == 2,
      s"expected 2 broadcast joins:\n$plan")
  }

  test("q04 4-way left join broadcasts all dims") {
    val (plan, _) = planOf("q04_multiway_left_join")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q08 latest-per-key is a single shuffle (one window, no extra exchange)") {
    val (plan, _) = planOf("q08_latest_per_key")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 2,
      s"SCD1 must not re-shuffle beyond the key partition + presentation sort:\n$plan")
  }

  test("d23 candidate generation contains no cartesian product and no pair-dedup aggregate") {
    val (plan, _) = planOf("d23_dedup_minhash")
    assert(!plan.contains("CartesianProduct"), "LSH must be an equi-join, not all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "LSH must be an equi-join")
  }

  test("d23b oracle-checked minhash is an equi-join with map-side partial min aggregation") {
    val (plan, _) = planOf("d23b_minhash_oracle")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LSH candidate generation must be an equi-join")
    assert(plan.linesIterator.count(l => l.contains("HashAggregate")) >= 2,
      "signature mins must partial-aggregate before the exchange")
  }

  test("d24b oracle-checked simhash is an equi-join on the chunk key") {
    val (plan, _) = planOf("d24b_simhash_oracle")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "simhash candidate generation must be an equi-join")
  }

  test("d25b band-blocked ngram jaccard contains no cartesian product") {
    val (plan, _) = planOf("d25b_ngram_banded")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "band-blocked candidate generation must be an equi-join")
  }

  test("d28 bucketed embedding near-dup is an equi-join on the band key, never all-pairs") {
    val (plan, _) = planOf("d28_embed_neardup_lsh")
    assert(!plan.contains("CartesianProduct"),
      "bucketed embedding dedup must be an equi-join, not all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bucketed embedding dedup must be an equi-join")
  }

  test("a27 broadcasts the query vectors; the corpus scan is never exchanged before scoring") {
    val (plan, _) = planOf("a27_ann_brute")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"queries side must broadcast:\n$plan")
  }

  test("sweep: no query plan contains an unintended cartesian or nested-loop join") {
    // Every BNLJ below is a deliberate broadcast of a tiny side:
    //   a27  exact brute-force baseline — 8 query vectors broadcast
    //   a29  IVF cell routing via array_contains — 8 query rows
    //   d26  exact all-pairs verification baseline (d28 = scale path)
    //   q28  date-spine span attach — 1-row min/max bounds
    //   q30  incremental-export watermark — 1-row aggregate
    // Nothing may use CartesianProduct, and no NEW query may grow a
    // BNLJ without being justified here.
    val allowedBnlj = Set("a27_ann_brute", "a29_ann_ivf", "d26_embed_neardup",
      "q28_date_spine", "q30_incremental_export")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name grew a cartesian product")
      if (!allowedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name grew a nested-loop join — broadcast-justify it or fix the plan")
    }
  }

  test("native expressions appear in the optimized plans (not HOF fallbacks)") {
    val (plan26, _) = planOf("d26_embed_neardup")
    assert(plan26.contains("float_dot") || plan26.contains("FloatDot"),
      "d26 must use the native dot product")
    val (plan24, _) = planOf("d24_dedup_simhash")
    assert(plan24.contains("simhash64") || plan24.contains("SimHash64"),
      "d24 must use the native simhash")
  }
}
