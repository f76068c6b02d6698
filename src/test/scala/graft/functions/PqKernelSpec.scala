package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PqKernels.assign]]/[[PqKernels.adc]] to the declarative
  * definition they replace (per-subspace argmin over codeword L2 with
  * `(d2 ASC, code ASC)` tie-break — the oracle's `ORDER BY d2, k`; ADC =
  * sum of per-subspace LUT entries at the assigned codes).
  */
class PqKernelSpec extends AnyFunSuite {
  private val M = 4
  private val B = 4
  private val K = 8

  private def refAssign(q: Seq[Long], cb: Array[Long]): Seq[(Long, Long)] =
    (0 until M).map { m =>
      (0 until K).map { k =>
        val d2 = (0 until B).map { j =>
          val diff = q(m * B + j) - cb((m * K + k) * B + j)
          diff * diff
        }.sum
        (d2, k.toLong)
      }.min.swap
    }

  private def kernelAssign(q: Seq[Long], cb: Array[Long]): Seq[(Long, Long)] = {
    val out = PqKernels.assign(new GenericArrayData(q.toArray), cb, M, B, K)
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getLong(0), r.getLong(1))
    }
  }

  test("assign equals the declarative argmin, adc the LUT sum, on random inputs") {
    val vals = Gen.chooseNum(-50L, 50L)
    val vecGen = Gen.listOfN(M * B, vals)
    val cbGen = Gen.listOfN(M * K * B, vals)
    val lutGen = Gen.listOfN(M * K, Gen.chooseNum(0L, 1000L))
    val params = Gen.Parameters.default
    (1 to 500).foreach { trial =>
      val q = vecGen.pureApply(params, Seed(trial * 31L)).toVector
      val cb = cbGen.pureApply(params, Seed(trial * 37L)).toArray
      val lut = lutGen.pureApply(params, Seed(trial * 41L)).toArray
      val got = kernelAssign(q, cb)
      assert(got === refAssign(q, cb), s"assign trial $trial")
      val codesArr = new GenericArrayData(got.map { case (code, d2) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](code, d2))
      }.toArray[Any])
      val refAdc = (0 until M).map(m => lut(m * K + got(m)._1.toInt)).sum
      assert(PqKernels.adc(codesArr, lut, K) === refAdc, s"adc trial $trial")
    }
  }

  test("ties break toward the lowest code") {
    // all-identical codewords: every d2 equal, code 0 must win
    val cb = Array.fill(M * K * B)(3L)
    val q = Seq.fill(M * B)(1L)
    assert(kernelAssign(q, cb).forall { case (code, d2) =>
      code == 0L && d2 == B * 4L
    })
  }
}
