package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact per-key ranking without a corpus-sized per-key
  * sort — the scale-safe replacement for
  * `row_number() OVER (PARTITION BY key ORDER BY draw, tie)` when
  * `key` has few values (cells, shards) and the corpus is large:
  * that window funnels the whole corpus through |key| reducers.
  *
  * Requires `draw` to be hash-uniform on [0, 2^(bucketShift+bucketBits)).
  * The draw space then splits into 2^bucketBits FIXED width-2^bucketShift
  * ranges (`dbkt = draw >> bucketShift`) that are balanced at any
  * corpus size and any key skew (the bucket key is the hash draw,
  * not the skew-prone key population) and deterministic — no sampled
  * range boundaries to persist or replay. Rank locally within
  * (key, dbkt) — |key| × 2^bucketBits bounded partitions — then add
  * the per-(key, dbkt) row-count prefix offset, a tiny aggregate
  * whose prefix sum is windowed over ≤ |key| × 2^bucketBits rows and
  * BROADCAST back. Exact: every row in a lower dbkt of the same key
  * holds a strictly smaller draw, so
  * global rank = lower-bucket count + local rank.
  *
  * ONE definition shared by d36 (cluster-balanced sampling, key =
  * centroid cell) and t50 (epoch shard shuffle, key = shard), so the
  * two cannot drift; each caller's DuckDB oracle is the plain
  * one-window form, which doubles as the cross-engine proof that the
  * two-level rank equals the single-window rank. */
object Ranks {
  /** The prefix-SUM sibling of [[bucketedRank]]: exact inclusive
    * running total of `value` per key in (draw, tie) order, through
    * the same two-level decomposition — a local window sum within
    * (key, dbkt) plus broadcast per-bucket SUM offsets — so a global
    * cumulative sum (t54's token offsets within a shard) never runs
    * one corpus-sized window per key. Exactness argument is
    * bucketedRank's: every row in a lower dbkt of the same key holds
    * a strictly smaller draw, so global cumsum = lower-bucket total
    * + local cumsum. `value` must be non-nullable integral (sums in
    * LongType). */
  def bucketedCumsum(df: DataFrame, key: Column, draw: Column, tie: Column,
      value: Column, bucketShift: Int, cumName: String): DataFrame = {
    val wLocal = Window.partitionBy("gc_key", "dbkt").orderBy("gc_draw", "gc_tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy("gc_key").orderBy("dbkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = df
      .withColumn("gc_key", key)
      .withColumn("gc_draw", draw)
      .withColumn("gc_tie", tie)
      .withColumn("gc_val", value.cast("long"))
      .withColumn("dbkt", shiftright(col("gc_draw"), bucketShift))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = base.groupBy("gc_key", "dbkt")
      .agg(sum("gc_val").as("bs"))
      .withColumn("soff", coalesce(sum("bs").over(wOff), lit(0L)))
      .select("gc_key", "dbkt", "soff")
    base
      .withColumn("bucket_cum", sum(col("gc_val")).over(wLocal))
      .join(broadcast(offsets), Seq("gc_key", "dbkt"))
      .withColumn(cumName, col("soff") + col("bucket_cum"))
      .drop("gc_key", "gc_draw", "gc_tie", "gc_val", "dbkt", "bs", "soff", "bucket_cum")
  }

  /** The VALUE-ORDERED sibling of [[bucketedCumsum]]: exact global
    * running total in a data-dependent sort order (revenue desc for
    * q67's Pareto cut) where the order column is NOT hash-uniform,
    * so the fixed-width dbkt trick does not apply. Instead the
    * frame range-partitions on the total order (`sortCols` MUST be
    * a total order — include a tie column): repartitionByRange's
    * sampled boundaries make the PARTITIONING nondeterministic, but
    * every partition is a contiguous sorted range, so
    * global cumsum = lower-partition totals + local cumsum
    * is a pure function of the data — the RESULT is deterministic
    * for any boundary draw. Local cumsums window per
    * spark_partition_id (parallel across ranges); the per-partition
    * totals are a ≤`parts`-row aggregate whose prefix sum
    * broadcasts back. Unlike bucketedRank's persist (a pure COST
    * choice — dbkt is a function of the data, so a recomputed block
    * re-derives the same bucket), rc_pid is only meaningful for the
    * materialization it was stamped on: a lost persisted block would
    * re-run repartitionByRange, whose SAMPLED boundaries can shift
    * with upstream row order, silently disagreeing with the
    * already-broadcast offsets. The base therefore LOCAL-CHECKPOINTS
    * (eager): lineage is cut, so a block can never be recomputed —
    * losing an executor fails the job loudly instead of corrupting
    * the cumsum (fail-stop over wrong-answer, the posture a
    * correctness-critical stamp requires). This is the production
    * replacement for a single-partition `SUM OVER (ORDER BY value)`
    * window: the only global sort is the range exchange Spark's own
    * ORDER BY would do anyway. */
  def rangeCumsum(df: DataFrame, sortCols: Seq[Column], value: Column,
      parts: Int, cumName: String): DataFrame = {
    val base = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("rc_val", value.cast("long"))
      .withColumn("rc_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy("rc_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy("rc_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("rc_pid").agg(sum("rc_val").as("ps"))
      .withColumn("poff", coalesce(sum("ps").over(wOff), lit(0L)))
      .select("rc_pid", "poff")
    base
      .withColumn("rc_local", sum(col("rc_val")).over(wLocal))
      .join(broadcast(offsets), Seq("rc_pid"))
      .withColumn(cumName, col("poff") + col("rc_local"))
      .drop("rc_pid", "rc_val", "rc_local", "poff")
  }

  def bucketedRank(df: DataFrame, key: Column, draw: Column, tie: Column,
      bucketShift: Int, rankName: String): DataFrame = {
    val wLocal = Window.partitionBy("gr_key", "dbkt").orderBy("gr_draw", "gr_tie")
    // prefix-offset window runs over the tiny (key, dbkt) COUNT
    // table, never the corpus
    val wOff = Window.partitionBy("gr_key").orderBy("dbkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // exact ranking is intrinsically two-pass (pass 1 counts the
    // buckets, pass 2 ranks within them) — persist the keyed stream
    // so the passes share ONE evaluation of the upstream projection
    // (for d36 that projection is the 16-centroid distance scan;
    // unpersisted, the whole corpus pipeline would execute twice).
    // MEMORY_AND_DISK is the production posture: at 100 TB this is
    // the same materialize-once a shard-writing job does anyway, and
    // blocks are reclaimed by the ContextCleaner when the plan is
    // dereferenced.
    val base = df
      .withColumn("gr_key", key)
      .withColumn("gr_draw", draw)
      .withColumn("gr_tie", tie)
      .withColumn("dbkt", shiftright(col("gr_draw"), bucketShift))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = base.groupBy("gr_key", "dbkt")
      .agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("gr_key", "dbkt", "boff")
    base
      .withColumn("bucket_rank", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("gr_key", "dbkt"))
      .withColumn(rankName, col("boff") + col("bucket_rank"))
      .drop("gr_key", "gr_draw", "gr_tie", "dbkt", "bn", "boff", "bucket_rank")
  }
}
