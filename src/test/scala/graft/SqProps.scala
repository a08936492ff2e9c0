package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.ArrayData

import graft.operators.SqKernels

/** Properties of the SQ8 quantizer kernels over random vectors and
  * ranges (kernel-level, no session needed).
  */
object SqProps extends Properties("sq8") {

  private val caseGen: Gen[(Array[Float], Array[Double], Array[Double])] = for {
    n <- Gen.chooseNum(1, 32)
    lo <- Gen.listOfN(n, Gen.chooseNum(-50.0, 49.0))
    span <- Gen.listOfN(n, Gen.chooseNum(0.0, 100.0)) // 0 span = degenerate dim
    // values inside [lo, lo+span] so codes are in-range without clamping
    fs <- Gen.listOfN(n, Gen.chooseNum(0.0, 1.0))
  } yield {
    val mins = lo.toArray
    val maxs = lo.zip(span).map { case (l, s) => l + s }.toArray
    val xs = fs.zipWithIndex.map { case (f, i) =>
      (mins(i) + f * (maxs(i) - mins(i))).toFloat }.toArray
    (xs, mins, maxs)
  }

  property("codes always land in [0, 255]") = forAll(caseGen) {
    case (xs, mins, maxs) =>
      val codes = SqKernels.encode(ArrayData.toArrayData(xs), isFloat = true,
        mins, maxs)
      (0 until codes.numElements()).forall { i =>
        val c = codes.getInt(i); c >= 0 && c <= 255
      }
  }

  property("per-dim dequantization error <= half a step") = forAll(caseGen) {
    case (xs, mins, maxs) =>
      val codes = SqKernels.encode(ArrayData.toArrayData(xs), isFloat = true,
        mins, maxs)
      (0 until codes.numElements()).forall { i =>
        val mn = mins(i); val mx = maxs(i)
        val dq = mn + codes.getInt(i) * (mx - mn) / 255.0
        val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
        // float input is itself a rounded double; allow that epsilon too
        math.abs(dq - xs(i).toDouble) <= step / 2.0 + 1e-6 * math.max(1.0, math.abs(mx))
      }
  }

  property("sq8 l2 distance equals l2 over dequantized values") = forAll(caseGen) {
    case (xs, mins, maxs) =>
      val codes = SqKernels.encode(ArrayData.toArrayData(xs), isFloat = true,
        mins, maxs)
      val viaKernel = SqKernels.l2(codes, ArrayData.toArrayData(xs),
        qIsFloat = true, mins, maxs)
      val manual = math.sqrt((0 until codes.numElements()).map { i =>
        val mn = mins(i); val mx = maxs(i)
        val d = mn + codes.getInt(i) * (mx - mn) / 255.0 - xs(i).toDouble
        d * d
      }.sum)
      math.abs(viaKernel - manual) <= 1e-9 * math.max(1.0, manual)
  }

  property("degenerate (mx == mn) dims encode 0 and dequantize to mn") =
    forAll(Gen.chooseNum(-100.0, 100.0)) { v =>
      val mins = Array(v); val maxs = Array(v)
      val codes = SqKernels.encode(
        ArrayData.toArrayData(Array(v.toFloat)), isFloat = true, mins, maxs)
      codes.getInt(0) == 0
    }
}
