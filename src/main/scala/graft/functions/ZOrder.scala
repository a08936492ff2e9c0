package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Morton (Z-order) bit-interleave — the multi-column data-layout
  * key behind `OPTIMIZE ZORDER BY` in lakehouse engines: rows sorted
  * by z before an at-rest write put points close in BOTH dimensions
  * into the same parquet row groups, so min/max stats prune scans
  * for predicates on EITHER column (a single-column sort only prunes
  * its own column).
  *
  * z interleaves the low 31 bits of each input (x even positions, y
  * odd), yielding a non-negative 62-bit key: inputs must be in
  * [0, 2^31); negatives/overflow throw rather than silently
  * mis-cluster. Monotone in each coordinate with the other fixed —
  * spec-pinned, since that is what makes range predicates prunable.
  */
object ZOrderKernels {
  def interleave(x: Long, y: Long): Long = {
    require(x >= 0 && x < (1L << 31) && y >= 0 && y < (1L << 31),
      s"zorder inputs must be in [0, 2^31): ($x, $y)")
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** zorder(x, y): Morton key of two non-negative integral columns. */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects integral inputs, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case l => l.asInstanceOf[Long]
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrderKernels.interleave(asLong(l), asLong(r))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernels.interleave((long)($a), (long)($b))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  def zorder(x: Column, y: Column): Column =
    Shims.column(ZOrderExpr(Shims.expression(x), Shims.expression(y)))
}
