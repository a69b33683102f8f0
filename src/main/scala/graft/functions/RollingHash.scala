package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Rabin–Karp polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ bytes(i) · B^(n−1−i)  (mod 2⁶⁴, B = 1000003).
  *
  * The *rolling* property — h("xs") can be updated to h("xs"[1:] + c)
  * in O(1) — is what makes this the standard fingerprint for
  * content-defined chunking and shift-resistant document signatures;
  * here it provides a second, structure-sensitive fingerprint next
  * to t32's normalized md5 (md5 of the whole text detects only
  * whole-document duplicates; polynomial hashes of sliding windows
  * detect shared substrings). Codegen: one tight byte loop. */
case class RollingHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  val Base = 1000003L

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $x.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${Base}L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash64(text: Column): Column =
    GraftBridge.column(RollingHash64(GraftBridge.expression(text)))
}
