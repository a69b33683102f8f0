package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for float-vector math.
  *
  * The built-in route (`zip_with` + `aggregate` higher-order
  * functions) allocates a lambda frame per element and is excluded
  * from whole-stage codegen; for O(n²) similarity joins that is the
  * hot path. These expressions generate a tight primitive loop over
  * the parquet `array<float>` ArrayData — no boxing, no lambda, and
  * they stay inside WholeStageCodegen spans.
  *
  * Summation is sequential left-to-right in double precision,
  * matching both the higher-order-function formulation and DuckDB's
  * `list_sum(list_transform(...))` oracle, so results are
  * bit-identical across all three.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of an array<float>, double precision. */
case class FloatNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble; acc += v * v; i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  double $v = (double) $x.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatNorm =
    copy(child = newChild)
}

/** Column-level entry points. */
object VectorExprs {
  def floatDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def floatNorm(a: Column): Column =
    GraftBridge.column(FloatNorm(GraftBridge.expression(a)))
  /** cosine(a, b) given precomputed norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    floatDot(a, b) / (normA * normB)

  /** Project the vector norm and drop zero-norm (empty/degenerate)
    * vectors — they have no defined cosine, and ANSI mode turns the
    * division into a job failure. Shared by every cosine consumer so
    * the degenerate-vector policy can't diverge between ops. */
  def withNorm(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("norm", floatNorm(org.apache.spark.sql.functions.col("embedding")))
      .filter(org.apache.spark.sql.functions.col("norm") > 0)
}
