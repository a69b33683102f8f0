package graft

import org.apache.spark.sql.functions._
import graft.functions.{SetExprs, VectorExprs}

/** Unit specs for the native Catalyst expressions, exercised through
  * real DataFrame evaluation (both interpreted and codegen paths run
  * in local mode). */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("FloatDot matches an explicit double-precision reference") {
    val a = Array(1.5f, -2.0f, 0.25f)
    val b = Array(4.0f, 0.5f, -8.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val got = Seq((a, b)).toDF("x", "y")
      .select(VectorExprs.floatDot(col("x"), col("y")).as("d"))
      .as[Double].head()
    assert(got == expected)
  }

  test("FloatDot/FloatNorm handle empty arrays and nulls") {
    val rows = Seq(
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (None, Some(Array(1.0f))),
      (Some(Array(3.0f, 4.0f)), Some(Array(3.0f, 4.0f))))
    val out = rows.toDF("x", "y")
      .select(
        VectorExprs.floatDot(col("x"), col("y")).as("d"),
        VectorExprs.floatNorm(col("x")).as("n"))
      .collect()
    assert(out(0).getDouble(0) == 0.0 && out(0).getDouble(1) == 0.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null in → null out
    assert(out(2).getDouble(0) == 25.0 && out(2).getDouble(1) == 5.0)
  }

  test("SortedLongIntersectSize counts common elements of sorted arrays") {
    val cases = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L), 2),
      (Array(1L, 2L), Array(3L, 4L), 0),
      (Array.empty[Long], Array(1L), 0),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L), 3))
    cases.foreach { case (x, y, want) =>
      val got = Seq((x, y)).toDF("x", "y")
        .select(SetExprs.sortedIntersectSize(col("x"), col("y")).as("c"))
        .as[Int].head()
      assert(got == want, s"${x.toSeq} ∩ ${y.toSeq}")
    }
  }

  test("SimHash64 matches an independent Scala reference implementation") {
    val hashes = Array(0x123456789abcdefL, -0x5544332211L, 0x777L, -1L, 42L)
    def reference(hs: Array[Long]): Long = {
      val votes = Array.fill(64)(0)
      for (h <- hs; j <- 0 until 64)
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val got = Seq(Tuple1(hashes)).toDF("h")
      .select(SetExprs.simhash64(col("h")).as("s")).as[Long].head()
    assert(got == reference(hashes))
  }

  test("FirstEqualBand returns the first matching band else -1") {
    val cases = Seq(
      // bandRows=2: bands are [0,1],[2,3]
      (Array(1L, 2L, 3L, 4L), Array(9L, 9L, 3L, 4L), 2, 1),
      (Array(1L, 2L, 3L, 4L), Array(1L, 2L, 9L, 9L), 2, 0),
      (Array(1L, 2L, 3L, 4L), Array(9L, 9L, 9L, 9L), 2, -1),
      (Array(5L), Array(5L), 1, 0))
    cases.foreach { case (x, y, r, want) =>
      val got = Seq((x, y)).toDF("x", "y")
        .select(SetExprs.firstEqualBand(col("x"), col("y"), r).as("b"))
        .as[Int].head()
      assert(got == want, s"${x.toSeq} vs ${y.toSeq} r=$r")
    }
  }

  test("regression: zero-norm embeddings are excluded, not a crash (ANSI div-by-zero)") {
    val dir = java.nio.file.Files.createTempDirectory("probeemb").toString
    Seq(
      (0L, Some(Array(1.0f, 0.0f)), 1),
      (1L, Some(Array(1.0f, 0.0f)), 1),
      (2L, Some(Array.empty[Float]), 1),
      (3L, Option.empty[Array[Float]], 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.dedup.Dedup.d26EmbedNeardup(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((0L, 1L, 1.0)))
  }
}
