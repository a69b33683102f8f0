package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for hashed-set similarity.
  *
  * The scalable formulation of shingle-set Jaccard: hash each
  * shingle to a long ONCE per document (`xxhash64` projection),
  * sort, and compare documents with a merge-walk over two sorted
  * long arrays — no per-pair hash-set allocation, no per-pair
  * string hashing, stays inside WholeStageCodegen. On an O(n²) or
  * LSH-candidate pair stream this is the difference between
  * hours and seconds at scale (64-bit collisions are ~1e-15 per
  * pair — set sizes are preserved w.h.p., so results equal the
  * exact string-set computation).
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array of per-feature hashes: bit j of the
  * result is set iff the signed vote sum of feature-hash bits j is
  * positive. Replaces a 64×n interpreted nested-lambda with one
  * tight generated loop (n adds per bit-position via an int[64]
  * vote accumulator). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < x.numElements()) {
      val h = x.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += (($h >>> $j) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Index of the first LSH band on which two signatures agree, or -1.
  * Bands are consecutive slices of `bandRows` elements. Used as a
  * join post-filter (`band_id === firstEqualBand(...)`) so each
  * candidate pair is emitted by exactly ONE band — the classic
  * LSH dedup trick that removes the distinct-pairs shuffle
  * entirely (the candidate stream is unique by construction). */
case class FirstEqualBand(left: Expression, right: Expression, bandRows: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_equal_band"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nBands = math.min(x.numElements(), y.numElements()) / bandRows
    var band = 0
    while (band < nBands) {
      var r = 0
      var eq = true
      while (eq && r < bandRows) {
        if (x.getLong(band * bandRows + r) != y.getLong(band * bandRows + r)) eq = false
        r += 1
      }
      if (eq) return band
      band += 1
    }
    -1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nBands = ctx.freshName("nBands")
      val band = ctx.freshName("band"); val r = ctx.freshName("r")
      val eq = ctx.freshName("eq"); val res = ctx.freshName("res")
      s"""
         |int $nBands = java.lang.Math.min($x.numElements(), $y.numElements()) / $bandRows;
         |int $res = -1;
         |for (int $band = 0; $band < $nBands && $res < 0; $band++) {
         |  boolean $eq = true;
         |  for (int $r = 0; $eq && $r < $bandRows; $r++) {
         |    if ($x.getLong($band * $bandRows + $r) != $y.getLong($band * $bandRows + $r)) $eq = false;
         |  }
         |  if ($eq) $res = $band;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualBand =
    copy(left = newLeft, right = newRight)
}

object SetExprs {
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftBridge.column(SortedLongIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def simhash64(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))
  def firstEqualBand(a: Column, b: Column, bandRows: Int): Column =
    GraftBridge.column(FirstEqualBand(
      GraftBridge.expression(a), GraftBridge.expression(b), bandRows))
}
