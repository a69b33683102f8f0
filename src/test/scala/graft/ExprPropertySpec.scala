package graft

import org.apache.spark.sql.functions._
import graft.functions.{SetExprs, VectorExprs}

/** Randomized equivalence of the native codegen expressions against
  * straightforward JVM reference implementations — the generated
  * loops must agree with the obvious Scala code on arbitrary inputs,
  * not just handcrafted cases. Fixed seed → deterministic. */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  private def randomSortedLongs(maxLen: Int): Array[Long] =
    Array.fill(rng.nextInt(maxLen))(rng.nextLong()).distinct.sorted

  test("SortedLongIntersectSize == Set.intersect.size on random sorted arrays") {
    // small value domain forces frequent collisions; wide domain forces none
    val cases =
      Seq.fill(15)((randomSortedLongs(30), randomSortedLongs(30))) ++
        Seq.fill(15)((
          Array.fill(rng.nextInt(20))(rng.nextInt(10).toLong).distinct.sorted,
          Array.fill(rng.nextInt(20))(rng.nextInt(10).toLong).distinct.sorted))
    val got = cases.toDF("x", "y")
      .select(SetExprs.sortedIntersectSize(col("x"), col("y")))
      .as[Int].collect()
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == a.toSet.intersect(b.toSet).size,
        s"${a.toSeq} ∩ ${b.toSeq}")
    }
  }

  test("FloatDot/FloatNorm bit-identical to the sequential double fold") {
    val cases = Seq.fill(30)((
      Array.fill(rng.nextInt(80))(rng.nextFloat() * 200 - 100),
      Array.fill(rng.nextInt(80))(rng.nextFloat() * 200 - 100)))
    val got = cases.toDF("x", "y")
      .select(
        VectorExprs.floatDot(col("x"), col("y")),
        VectorExprs.floatNorm(col("x")))
      .as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((a, b), (d, nm)) =>
      val n = math.min(a.length, b.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a(i).toDouble * b(i); i += 1 }
      var sq = 0.0
      a.foreach(v => sq += v.toDouble * v)
      assert(d == dot, "dot must be bit-identical to the sequential fold")
      assert(nm == math.sqrt(sq), "norm must be bit-identical")
    }
  }

  test("SimHash64 == reference vote implementation on random hash arrays") {
    def reference(hs: Array[Long]): Long = {
      val votes = Array.fill(64)(0)
      for (h <- hs; j <- 0 until 64)
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val cases = Seq.fill(30)(Array.fill(1 + rng.nextInt(50))(rng.nextLong()))
    val got = cases.map(Tuple1(_)).toDF("h")
      .select(SetExprs.simhash64(col("h"))).as[Long].collect()
    cases.zip(got).foreach { case (hs, g) => assert(g == reference(hs)) }
  }

  test("size-ratio prefilter soundness: ratio < t implies jaccard < t on random sets") {
    // the theorem verifyPairs/d25b rely on: J(A,B) = |∩|/|∪| ≤
    // min(|A|,|B|)/max(|A|,|B|), so a size-ratio cut can never drop
    // a pair at or above the threshold
    for (_ <- 1 to 500) {
      val a = Array.fill(1 + rng.nextInt(60))(rng.nextInt(40)).toSet
      val b = Array.fill(1 + rng.nextInt(60))(rng.nextInt(40)).toSet
      val j = a.intersect(b).size.toDouble / a.union(b).size
      val ratio = math.min(a.size, b.size).toDouble / math.max(a.size, b.size)
      assert(j <= ratio + 1e-12, s"jaccard $j exceeds size-ratio bound $ratio")
    }
  }

  test("prefilter soundness under ROUNDING: any pair the rounded verify keeps has ratio >= 0.69995") {
    // the verify filter applies to ROUND(J, 4), so it keeps every
    // pair with true J >= 0.69995 (HALF_UP) — including true J in
    // [0.69995, 0.7), whose size ratio can also be < 0.7. The
    // prefilter must therefore cut at the rounded threshold's lower
    // edge, never at 0.7 itself.
    for (_ <- 1 to 2000) {
      val a = Array.fill(1 + rng.nextInt(200))(rng.nextInt(150)).toSet
      val b = Array.fill(1 + rng.nextInt(200))(rng.nextInt(150)).toSet
      val j = a.intersect(b).size.toDouble / a.union(b).size
      val rounded = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ratio = math.min(a.size, b.size).toDouble / math.max(a.size, b.size)
      if (rounded >= 0.7)
        assert(ratio >= 0.69995,
          s"rounded-kept pair (J=$j) would be dropped by an edge-0.69995 prefilter (ratio=$ratio)")
    }
  }

  test("verifyPairs keeps a rounding-tie pair whose size ratio is below 0.7") {
    // adversarial construction (ADVICE r2, medium): |A|=25000 tokens,
    // B = first 17499 of them → true J = 17499/25000 = 0.69996,
    // which ROUND(·,4) keeps (→ 0.7000), while the size ratio equals
    // J = 0.69996 < 0.7 — a prefilter cutting at 0.7 drops the pair
    // and diverges from the prefilter-free DuckDB oracle. The
    // edge-0.69995 cut must keep it, with the rounded score.
    // (The exact tie 13999/20000 is NOT such a case: its nearest
    // double is just below 0.69995, so HALF_UP gives 0.6999 in both
    // engines and the pair is consistently dropped.)
    import org.apache.spark.sql.functions._
    val docA = (0 until 25000).map(i => s"t$i").mkString(" ")
    val docB = (0 until 17499).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("sh"))
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = graft.dedup.Dedup.verifyPairs(pairs, docs)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0.7)),
      s"tie pair must survive the prefilter with rounded jaccard 0.7, got ${out.toSeq}")
  }

  test("FirstEqualBand: result is the first index where all band rows agree") {
    // small value domain (0..3) makes equal bands common; a third of
    // the cases have UNEQUAL lengths (incl. non-multiples of r) to pin
    // the min(numElements)/bandRows truncation the generated loop and
    // the interpreted eval must agree on
    val cases = Seq.fill(50) {
      val r = 1 + rng.nextInt(4)
      val n = 1 + rng.nextInt(5)
      val (lenA, lenB) =
        if (rng.nextInt(3) == 0) (rng.nextInt(4 * r + 2), rng.nextInt(4 * r + 2))
        else (n * r, n * r)
      (Array.fill(lenA)(rng.nextInt(4).toLong),
        Array.fill(lenB)(rng.nextInt(4).toLong), r)
    }
    cases.groupBy(_._3).foreach { case (r, group) =>
      val got = group.map(c => (c._1, c._2)).toDF("x", "y")
        .select(SetExprs.firstEqualBand(col("x"), col("y"), r))
        .as[Int].collect()
      group.zip(got).foreach { case ((a, b, _), g) =>
        val want = (0 until math.min(a.length, b.length) / r).find { band =>
          (0 until r).forall(i => a(band * r + i) == b(band * r + i))
        }.getOrElse(-1)
        assert(g == want, s"r=$r ${a.toSeq} vs ${b.toSeq}")
      }
    }
  }

  test("gramKeys == JVM md5-window reference on random token arrays") {
    // load-bearing for d29/d30/d31/s39: every n-window's 60-bit
    // md5-prefix key, including the short-doc empty case and n=1
    def reference(toks: Array[String], n: Int): Seq[Long] =
      if (toks.length < n) Seq.empty
      else (0 to toks.length - n).map { i =>
        val gram = toks.slice(i, i + n).mkString(" ")
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(gram.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }
    val vocab = Array("aa", "bb", "cc", "dd", "")
    val cases = Seq.fill(40) {
      val n = 1 + rng.nextInt(5)
      (Array.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.length))), n)
    }
    cases.groupBy(_._2).foreach { case (n, group) =>
      val got = group.map(_._1).toDF("toks")
        .select(graft.dedup.Dedup.gramKeys(col("toks"), n))
        .as[Seq[Long]].collect()
      group.zip(got).foreach { case ((toks, _), g) =>
        assert(g == reference(toks, n), s"n=$n toks=${toks.toSeq}")
      }
    }
  }

  test("a30 scalar quantization: dequantized value within one code step of the input") {
    // the error bound the AnnSpec distortion assertion rests on:
    // |dq(x) - x| ≤ (mx - mn)/255 for x ∈ [mn, mx], and bounds are
    // reproduced exactly (code 0 → mn; x = mx → code 255 → mx)
    val cases = Seq.fill(200) {
      val mn = rng.nextDouble() * 10 - 5
      val mx = mn + rng.nextDouble() * 10
      val x = mn + rng.nextDouble() * (mx - mn)
      (x, mn, mx)
    } ++ Seq((1.5, 1.5, 1.5), (2.0, 2.0, 5.0), (5.0, 2.0, 5.0))
    val got = cases.toDF("x", "mn", "mx").select(expr(
      """CASE WHEN mx > mn
        |THEN mn + floor((x - mn) * 255.0 / (mx - mn)) * (mx - mn) / 255.0
        |ELSE mn END""".stripMargin)).as[Double].collect()
    cases.zip(got).foreach { case ((x, mn, mx), dq) =>
      val step = if (mx > mn) (mx - mn) / 255.0 else 0.0
      assert(dq >= mn - 1e-12 && dq <= mx + 1e-12, s"dq $dq outside [$mn,$mx]")
      assert(math.abs(dq - x) <= step + 1e-12,
        s"|dq($x) - $x| = ${math.abs(dq - x)} > step $step (mn=$mn mx=$mx)")
    }
  }
}
