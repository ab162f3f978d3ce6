package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the quantization / dot-product kernels (pure
  * JVM — no Spark session needed).
  */
object VectorProps extends Properties("VectorKernels") {

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN && !f.isInfinite)

  private val vec: Gen[Array[Float]] =
    Gen.choose(1, 96).flatMap(n => Gen.listOfN(n, finiteFloat).map(_.toArray))

  private def quant(v: Array[Float]): Option[(Double, Array[Int], Long)] =
    Option(VectorKernels.quantizeInt8(new GenericArrayData(v), false)).map { row =>
      val arr = row.getArray(1)
      (row.getDouble(0), (0 until arr.numElements()).map(arr.getInt).toArray,
        row.getLong(2))
    }

  property("components bounded by ±127; max-magnitude component hits full scale") =
    forAll(vec) { v =>
      quant(v) match {
        case None => v.forall(_ == 0.0f) // only zero vectors quantize to null here
        case Some((scale, q, nClipped)) =>
          q.forall(qi => qi >= -127 && qi <= 127) &&
            nClipped == q.count(qi => math.abs(qi) == 127) &&
            nClipped >= 1 && // the max |x| component maps to ±127 exactly
            scale > 0
      }
    }

  property("reconstruction error ≤ scale/2 per component") = forAll(vec) { v =>
    quant(v) match {
      case None => v.forall(_ == 0.0f)
      case Some((scale, q, _)) =>
        v.zip(q).forall { case (x, qi) =>
          math.abs(qi * scale - x.toDouble) <= scale / 2 + 1e-9 * scale
        }
    }
  }

  property("NaN/Inf components always yield null, never a partial quantization") =
    forAll(vec, Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity),
        Gen.choose(0, 1000)) { (v, bad, posSeed) =>
      val poisoned = v.updated(posSeed % v.length, bad)
      VectorKernels.quantizeInt8(new GenericArrayData(poisoned), false) == null
    }

  property("float and double inputs quantize identically (floats promote exactly)") =
    forAll(vec) { v =>
      val f = VectorKernels.quantizeInt8(new GenericArrayData(v), false)
      val d = VectorKernels.quantizeInt8(new GenericArrayData(v.map(_.toDouble)), true)
      (f == null && d == null) || (f != null && d != null && {
        val (fa, da) = (f.getArray(1), d.getArray(1))
        f.getDouble(0) == d.getDouble(0) &&
          (0 until fa.numElements()).forall(i => fa.getInt(i) == da.getInt(i))
      })
    }

  property("int dot product is exact and symmetric") =
    forAll(Gen.choose(1, 64).flatMap(n => Gen.zip(
        Gen.listOfN(n, Gen.choose(-127, 127)), Gen.listOfN(n, Gen.choose(-127, 127))))) {
      case (a, b) =>
        def arr(xs: Seq[Int]): ArrayData = new GenericArrayData(xs.toArray)
        val d1 = VectorDotInt(null, null).nullSafeEval(arr(a), arr(b))
        val d2 = VectorDotInt(null, null).nullSafeEval(arr(b), arr(a))
        val expect = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum.toDouble
        d1 == expect && d2 == expect
    }
}
