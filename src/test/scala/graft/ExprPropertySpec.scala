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

  test("FirstEqualBand: result is the first index where all band rows agree") {
    // small value domain (0..3) makes equal bands common
    val cases = Seq.fill(50) {
      val r = 1 + rng.nextInt(4)
      val n = 1 + rng.nextInt(5)
      (Array.fill(n * r)(rng.nextInt(4).toLong),
        Array.fill(n * r)(rng.nextInt(4).toLong), r)
    }
    cases.groupBy(_._3).foreach { case (r, group) =>
      val got = group.map(c => (c._1, c._2)).toDF("x", "y")
        .select(SetExprs.firstEqualBand(col("x"), col("y"), r))
        .as[Int].collect()
      group.zip(got).foreach { case ((a, b, _), g) =>
        val want = (0 until a.length / r).find { band =>
          (0 until r).forall(i => a(band * r + i) == b(band * r + i))
        }.getOrElse(-1)
        assert(g == want, s"r=$r ${a.toSeq} vs ${b.toSeq}")
      }
    }
  }
}
