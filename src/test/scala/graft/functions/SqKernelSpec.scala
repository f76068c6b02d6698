package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SqKernels.reconstruct]] to the declarative SQ8 definition the
  * DuckDB oracle mirrors: code = (q - min) * 255 / span (truncating
  * division, non-negative operands), reconstruction = min + code * span /
  * 255, constant dimensions (span 0) reconstruct to the min. Also pins
  * the audit-relevant properties: reconstruction stays inside [min, max]
  * and is exact at both bounds.
  */
class SqKernelSpec extends AnyFunSuite {

  private def ref(q: Seq[Long], mins: Seq[Long], spans: Seq[Long]): Seq[Long] =
    q.indices.map { i =>
      if (spans(i) == 0L) mins(i)
      else mins(i) + ((q(i) - mins(i)) * 255L / spans(i)) * spans(i) / 255L
    }

  private def kernel(q: Seq[Long], mins: Seq[Long], spans: Seq[Long]): Seq[Long] = {
    val out = SqKernels.reconstruct(
      new GenericArrayData(q.toArray), mins.toArray, spans.toArray)
    (0 until out.numElements()).map(out.getLong)
  }

  test("kernel equals the declarative definition on random bounded inputs") {
    val D = 16
    val gen = for {
      mins <- Gen.listOfN(D, Gen.chooseNum(-2000L, 2000L))
      spans <- Gen.listOfN(D, Gen.chooseNum(0L, 4000L))
      fracs <- Gen.listOfN(D, Gen.chooseNum(0L, 1000L))
    } yield {
      // q always inside [min, min+span] — the invariant global bounds give
      val q = (0 until D).map(i => mins(i) + spans(i) * fracs(i) / 1000L)
      (q, mins, spans)
    }
    (0 until 200).foreach { n =>
      val (q, mins, spans) =
        gen.apply(Gen.Parameters.default, Seed(n.toLong)).get
      assert(kernel(q, mins, spans) == ref(q, mins, spans), s"seed $n")
    }
  }

  test("reconstruction is exact at both bounds and never leaves the range") {
    val mins = Seq(-100L, 0L, 37L)
    val spans = Seq(200L, 510L, 0L)
    // at the min: code 0 -> min
    assert(kernel(mins, mins, spans) == mins)
    // at the max: code 255 -> exactly the max (255*span/255 == span)
    val maxs = mins.zip(spans).map { case (m, s) => m + s }
    assert(kernel(maxs, mins, spans) == maxs)
    // interior points stay within [min, max]
    val mid = mins.zip(spans).map { case (m, s) => m + s / 3 }
    val r = kernel(mid, mins, spans)
    r.indices.foreach { i =>
      assert(r(i) >= mins(i) && r(i) <= maxs(i), s"dim $i out of range: ${r(i)}")
    }
  }
}
