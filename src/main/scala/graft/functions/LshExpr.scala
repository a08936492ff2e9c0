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

/** Shared dense-projection kernel: output component p =
  * dot(vec, plane_p) — called from both RpProject's interpreted eval
  * and its generated code, so the two paths cannot drift.
  *
  * Plane entry (p, j) draws from the single Weyl stream at index
  * `p * MAXDIM + j + 1`. MAXDIM (2048) must exceed any supported
  * input width so plane rows can NEVER overlap: with the former
  * `p * 64` stride, any input wider than 64 dims made plane p+1 a
  * 64-position shift of plane p (u(p+1, j) = u(p, j+64)), so the
  * projection components were not independent and the documented JL
  * distortion bound silently failed on embeddings with lag-64
  * autocorrelation. [[LshSignature]] deliberately KEEPS the p*64
  * stride — its packed-sign oracle contract is anchored at the
  * 64-dim corpus width and replayed verbatim by every lsh_* oracle.
  */
object RpKernels {
  final val MaxDim = 2048

  def project(vec: ArrayData, isFloat: Boolean, k: Int): ArrayData = {
    val n = vec.numElements()
    if (n > MaxDim) throw new IllegalArgumentException(
      s"rp_project supports input widths up to $MaxDim dims, got $n: " +
        "a wider vector would wrap plane p into plane p+1's Weyl-stream " +
        "rows, silently reintroducing the plane-aliasing MaxDim exists " +
        "to prevent")
    val out = new Array[Double](k)
    var p = 0
    while (p < k) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val u = ((p * MaxDim + j + 1) * 2654435761L % 4294967296L) / 4294967296.0 - 0.5
        dot += x * u
        j += 1
      }
      out(p) = dot
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Johnson–Lindenstrauss dense random projection (codegen'd): maps
  * array<float|double> of any width to array<double> of k components,
  * y_p = dot(vec, plane_p), with [[RpKernels]]' overlap-free plane
  * indexing (stride MaxDim=2048, valid for any input width up to
  * MaxDim dims; wider inputs are rejected rather than aliased — unlike
  * [[LshSignature]]'s 64-anchored stride). Plane entries are uniform in
  * [-0.5, 0.5) (variance 1/12), so E[l2²(y_a, y_b)] =
  * (k/12) · l2²(x_a, x_b) — distances are preserved up to the JL
  * distortion bound WITHOUT any training pass: at 100 TB this is a
  * map-only column transform, vs PCA's full Gram-matrix pass.
  */
case class RpProject(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rp_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rp_project expects array<float|double>, got ${t.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    RpKernels.project(v.asInstanceOf[ArrayData], isFloat, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RpKernels.project($a, $isFloat, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshExpr {
  def lsh_signature(vec: Column, numPlanes: Int = 8): Column =
    Shims.column(LshSignature(Shims.expression(vec), numPlanes))

  def rp_project(vec: Column, k: Int): Column =
    Shims.column(RpProject(Shims.expression(vec), k))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Shims.functionRegistry(spark).createOrReplaceTempFunction(
      "lsh_signature", es => LshSignature(es.head, 8), "built-in")
}
