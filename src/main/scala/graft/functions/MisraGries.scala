package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra–Gries frequent-items state: ≤ k tracked keys with
  * lower-bound counters, plus the total decrement mass `err` — for
  * every key (tracked or not), true_count − err ≤ counter ≤
  * true_count, so any key with true frequency > err is guaranteed
  * tracked. When `err` == 0 (no eviction anywhere — the distinct
  * count stayed ≤ k in every partial and every merge), the sketch
  * is EXACT, which is what lets the gate oracle-check the registered
  * query against plain exact counts. */
case class MGBuf(counters: Map[Long, Long], err: Long)

/** The Misra–Gries heavy-hitters sketch as a typed Spark Aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al. 2013,
  * "Mergeable Summaries"): each map task folds its partition into a
  * ≤ k-counter summary, and partials MERGE by counter-sum then
  * subtract-the-(k+1)-th-largest — so the exchange carries ≤ k rows
  * per partition regardless of input size or key cardinality. This
  * is THE bounded-memory answer to "top sources/users/tokens over
  * 100 TB" when the key domain is too large to groupBy exactly:
  * memory is O(k), error is ≤ n/(k+1) additive, and every key with
  * frequency above that bound is guaranteed present.
  *
  * Determinism: with no eviction (distinct ≤ k throughout) the
  * result is the exact count map, independent of partitioning; under
  * eviction the counters (not the guarantees) depend on the merge
  * tree, which is the standard sketch contract — the spec pins the
  * bounds, the gate runs in the exact regime. */
class MisraGries(k: Int) extends Aggregator[Long, MGBuf, MGBuf] {
  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, key: Long): MGBuf =
    b.counters.get(key) match {
      case Some(c) => b.copy(counters = b.counters.updated(key, c + 1))
      case None if b.counters.size < k =>
        b.copy(counters = b.counters.updated(key, 1L))
      case None =>
        // decrement-all: one unmatched arrival cancels one unit of
        // every tracked key — the classic MG step
        val dec = b.counters.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        MGBuf(dec, b.err + 1)
    }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator.map(key =>
      key -> (a.counters.getOrElse(key, 0L) + b.counters.getOrElse(key, 0L)))
      .toMap
    if (sum.size <= k) MGBuf(sum, a.err + b.err)
    else {
      // subtract the (k+1)-th largest count from everything, keep
      // positives — the mergeable-summaries rule: ≤ k survivors,
      // undercounts grow by exactly the cut
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap,
        a.err + b.err + cut)
    }
  }

  override def finish(r: MGBuf): MGBuf = r
  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
