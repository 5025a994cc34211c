package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length ASCII signature strings (e.g.
  * 32-char SimHash bit strings) — position-wise differing-byte count.
  *
  * Codegen'd byte loop over the UTF8String backing arrays: the SimHash
  * verify step runs this over every LSH candidate pair, so it must stay
  * inside whole-stage codegen (SURVEY §2.10 preference order: native
  * Expression > UDF). If lengths differ, the extra positions all count as
  * mismatches (defensive; signatures are fixed-width by construction).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
      s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.max(x.length, y.length) - n
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val d = ctx.freshName("d")
      s"""
         |byte[] $xb = $x.getBytes();
         |byte[] $yb = $y.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $d = java.lang.Math.max($xb.length, $yb.length) - $n;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xb[$i] != $yb[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def hamming(a: Column, b: Column): Column =
    GraftSqlShim.column(HammingDistance(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
