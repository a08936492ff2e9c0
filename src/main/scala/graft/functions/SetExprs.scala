package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** token_hash_set(text): the distinct token char-folds, SORTED
  * ascending — the set representation that makes pairwise similarity
  * a linear merge instead of a hash probe per element.
  */
case class TokenHashSet(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hash_set"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.tokenHashSet(v.asInstanceOf[UTF8String]))
  override protected def kernelCall(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      c: String): String =
    s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.TextKernels.tokenHashSet($c))"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sorted_intersect_size(a, b): |a ∩ b| for two ascending-sorted
  * long arrays — O(|a|+|b|) two-pointer merge, codegen'd. The per-pair
  * hot loop of the Jaccard verify pass.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""int $i = 0; int $j = 0; int $n = 0;
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SetExprs {
  def token_hash_set(c: Column): Column =
    Shims.column(TokenHashSet(Shims.expression(c)))
  def sorted_intersect_size(a: Column, b: Column): Column =
    Shims.column(SortedIntersectSize(Shims.expression(a), Shims.expression(b)))
}
