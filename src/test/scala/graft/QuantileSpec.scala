package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** q68/s60 — the mergeable quantile sketch's laws. The oracle pins
  * the end-to-end arithmetic cross-engine; these specs pin what SQL
  * cannot see: the bottom-k merge law (with REAL eviction, at a
  * small k — sf0.001 is the degenerate regime at the shipped 512),
  * idempotency under redelivery, the degenerate-exact boundary, and
  * the spec-bounded error in the true sampling regime (sf0.01). */
class QuantileSpec extends SparkSpec {
  import Relational.{q68Src, q68SampleK, q68SampleFold, q68Present}

  private lazy val src =
    q68Src(Tables.orders(spark, sfDir))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select("grp", "v", "key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("q68 bottom-k merge law: bottomK(bottomK(A) ∪ B) == bottomK(A ∪ B), with real eviction") {
    val k = 50 // ~300 orders/group at sf0.001 → every group evicts
    val a = src.filter(col("key") % 3 =!= 0)
    val b = src.filter(col("key") % 3 === 0)
    // the eviction path must actually run, or the law is vacuous
    assert(a.groupBy("grp").count().agg(min("count")).head.getLong(0) > k,
      "split A must exceed the budget in every group")
    val merged = q68SampleK(q68SampleK(a, k).unionByName(b), k)
    val direct = q68SampleK(a.unionByName(b), k)
    assert(rows(merged) == rows(direct),
      "merging a pre-sketched side must equal sketching the union")
  }

  test("q68 sample fold is idempotent under redelivery (the s52 set stance)") {
    val k = 50
    val b1 = src.filter(col("key") % 3 =!= 0)
    val b2 = src.filter(col("key") % 3 === 0)
    val once = q68SampleK(q68SampleK(b1, k).unionByName(b2).distinct(), k)
    // redeliver b2 in full against the already-folded state: every
    // re-delivered row either dedups against state or out-ranks out
    val twice = q68SampleK(once.unionByName(b2).distinct(), k)
    assert(rows(once) == rows(twice),
      "a re-delivered batch must not change the sample state")
    // and an evicted row stays evicted: the state holds the k
    // smallest draws of everything seen, so nothing outside it can
    // re-enter
    assert(once.groupBy("grp").count().agg(max("count")).head.getLong(0) == k)
  }

  test("q68 degenerate-exact boundary: k ≥ group size ⇒ the sample IS the group and every estimate is exact") {
    val out = SparkEntry.queries("q68_quantile_sketch")(spark, sfDir)
      .select("n", "sample_k", "abs_err_cents", "err_bp").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "sample must equal the group when n ≤ k")
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        "degenerate regime must be exact")
    }
  }

  test("q68 sampling-regime error is spec-bounded at sf0.01 (the in-band honesty gate)") {
    val out = SparkEntry.queries("q68_quantile_sketch")(
      spark, "/root/testdata/sf0.01")
      .select("n", "sample_k", "err_bp").collect()
    // the TRUE sampling regime: every group larger than the budget
    out.foreach(r => assert(r.getLong(0) > r.getLong(1),
      "sf0.01 must exercise real sampling (n > k)"))
    assert(out.map(_.getLong(1)).toSet == Set(Relational.q68K.toLong))
    val worst = out.map(_.getLong(2)).max
    // measured 963 bp at sf0.01 (p50, k=512); the bound is the
    // contract the sketch ships with
    assert(worst <= 2000, s"err_bp $worst exceeds the 2000 bp contract")
  }

  test("s60's live fold lands byte-equal on q68's batch sketch") {
    val live = SparkEntry.queries("s60_stream_quantiles")(spark, sfDir).collect()
    val batch = SparkEntry.queries("q68_quantile_sketch")(spark, sfDir).collect()
    assert(live.toSeq == batch.toSeq, "ordered slicing must be invisible")
  }

  test("q68Present measures the sample against the exact leg through ONE quantile definition") {
    // feed the full corpus as BOTH legs: the error must be
    // identically zero — the instrument and the product share the
    // rank-quantile body, so a divergence here is a definition split
    val out = q68Present(src, src).select("abs_err_cents").collect()
    assert(out.nonEmpty && out.forall(_.getLong(0) == 0L))
  }
}
