package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature (codegen'd).
  *
  * Bit p of the result is set iff dot(vec, plane_p) > 0, where plane
  * component (p, j) is the deterministic Knuth-hash value
  * ((p*64 + j + 1) * 2654435761 mod 2^32) / 2^32 - 0.5 — integer
  * arithmetic exact under IEEE double, so the signature is
  * reproducible in any engine (the DuckDB oracle and the
  * Ann.lshSignatureHof composition compute the identical value;
  * equality is spec-tested).
  */
case class LshSignature(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature expects array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val fl = isFloat
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (fl) a.getFloat(j).toDouble else a.getDouble(j)
        val u = ((p * 64 + j + 1) * 2654435761L % 4294967296L) / 4294967296.0 - 0.5
        dot += x * u
        j += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val u = ctx.freshName("u"); val sig = ctx.freshName("sig")
      val elem = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $u = (($p * 64 + $j + 1) * 2654435761L % 4294967296L) / 4294967296.0 - 0.5;
         |    $dot += $elem * $u;
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshExpr {
  def lsh_signature(vec: Column, numPlanes: Int = 8): Column =
    Shims.column(LshSignature(Shims.expression(vec), numPlanes))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Shims.functionRegistry(spark).createOrReplaceTempFunction(
      "lsh_signature", es => LshSignature(es.head, 8), "built-in")
}
