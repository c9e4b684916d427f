package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for q52's banding theorem: a 32-bit fingerprint cut
  * into 4 disjoint 8-bit bands; any pair within Hamming distance 2 has
  * ≥ 2 bands exactly equal (pigeonhole: 2 flipped bits can spoil at
  * most 2 bands), so the (band, value) equi-join is recall-complete.
  * Pure-logic mirror of the SQL expressions in LlmOps2.q52 — same
  * shifts, same masks.
  */
class SimHashBandingProps extends AnyFunSuite {

  private def bandKey(fp: Long, band: Int): Long = (fp >> (band * 8)) & 255L

  private def samples[T](g: Gen[T], n: Int = 500): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val fp32 = Gen.chooseNum(0L, (1L << 32) - 1)
  private val bitIdx = Gen.chooseNum(0, 31)

  test("Hamming <= 2 pairs always share at least one exact band") {
    val cases = samples(for {
      a <- fp32
      b1 <- bitIdx
      b2 <- bitIdx // may equal b1 → Hamming 1; flipping twice → Hamming 0
      flips <- Gen.chooseNum(0, 2)
    } yield (a, Seq(b1, b2).take(flips)))
    assert(cases.nonEmpty)
    for ((a, flips) <- cases) {
      val b = flips.foldLeft(a)((acc, bit) => acc ^ (1L << bit))
      assert(java.lang.Long.bitCount(a ^ b) <= 2)
      val shared = (0 until 4).count(k => bandKey(a, k) == bandKey(b, k))
      assert(shared >= 2,
        f"fp=$a%08x flips=$flips: only $shared shared bands")
    }
  }

  test("Hamming 3 concentrated in distinct bands can evade at most 3 bands (bound is tight)") {
    // demonstrates WHY the threshold-2 guarantee needs 4 bands: 3 bits
    // spread over 3 different bands still leave 1 exact band, but 4
    // bits over 4 bands would leave none — the declared threshold (2)
    // is the largest this banding is complete for with margin 2
    val a = 0x12345678L
    val b = a ^ (1L << 0) ^ (1L << 8) ^ (1L << 16) ^ (1L << 24)
    val shared = (0 until 4).count(k => bandKey(a, k) == bandKey(b, k))
    assert(shared == 0)
  }
}
