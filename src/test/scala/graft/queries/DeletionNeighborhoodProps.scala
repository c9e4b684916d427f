package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for q95's banding theorem: with N(s) = {s} ∪ {s minus
  * one character}, lev(a,b) ≤ 1 implies N(a) ∩ N(b) ≠ ∅ — substitution
  * at i ⇒ both sides delete i; insertion/deletion ⇒ the longer's
  * deletion IS the shorter; equality ⇒ the strings themselves. So the
  * variant equi-join is recall-complete and the exact levenshtein
  * filter only discards. The converse is deliberately false (N("ab")
  * and N("ba") intersect at "a"/"b" but lev = 2) — which is WHY the
  * verify step exists; the second property pins the full
  * candidate→verify pipeline against brute force on random corpora.
  * Pure-logic mirror of the expressions in LlmOps5.q95.
  */
class DeletionNeighborhoodProps extends AnyFunSuite {

  /** Reference Levenshtein (full DP — independent of the engine). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Mirror of q95's variant derivation (self + single deletions). */
  private def neighborhood(s: String): Set[String] =
    (s +: s.indices.map(i => s.substring(0, i) + s.substring(i + 1))).toSet

  /** d-deletion neighborhood: all strings from deleting ≤ d chars —
    * the pure-logic mirror of FuzzyJoin.variantsExpr. */
  private def neighborhoodD(s: String, d: Int): Set[String] = {
    var acc = Set(s)
    var frontier = Set(s)
    (1 to d).foreach { _ =>
      frontier = frontier.flatMap(v =>
        v.indices.map(i => v.substring(0, i) + v.substring(i + 1)))
      acc ++= frontier
    }
    acc
  }

  private def samples[T](g: Gen[T], n: Int = 400): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // small alphabet on purpose: dense edit-distance structure
  private val word: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      .map(_.mkString))

  test("lev <= 1 pairs always share a deletion variant (recall-complete)") {
    val pairs = samples(Gen.zip(word, word))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs if lev(a, b) <= 1)
      assert((neighborhood(a) & neighborhood(b)).nonEmpty, s"'$a' '$b'")
  }

  test("lev <= 2 pairs always share a <=2-deletion variant (d=2 recall)") {
    val pairs = samples(Gen.zip(word, word))
    assert(pairs.nonEmpty)
    for ((a, b) <- pairs if lev(a, b) <= 2)
      assert((neighborhoodD(a, 2) & neighborhoodD(b, 2)).nonEmpty, s"'$a' '$b'")
    // d=1 neighborhood is a strict subset (sanity on the mirror itself)
    for ((a, _) <- pairs)
      assert(neighborhood(a).subsetOf(neighborhoodD(a, 2)))
  }

  test("d=2 candidate->verify pipeline == brute force on random corpora") {
    val corpora = samples(Gen.listOfN(12, word).map(_.distinct), n = 120)
    assert(corpora.nonEmpty)
    for (names <- corpora) {
      val brute = for {
        a <- names; b <- names
        if a < b && { val d = lev(a, b); d >= 1 && d <= 2 }
      } yield (a, b)
      val banded = for {
        a <- names; b <- names
        if a < b && (neighborhoodD(a, 2) & neighborhoodD(b, 2)).nonEmpty &&
          { val d = lev(a, b); d >= 1 && d <= 2 }
      } yield (a, b)
      assert(banded.sorted == brute.sorted, names.mkString(","))
    }
  }

  test("candidate->verify pipeline == brute force on random corpora") {
    val corpora = samples(Gen.listOfN(12, word).map(_.distinct), n = 120)
    assert(corpora.nonEmpty)
    for (names <- corpora) {
      val brute = for {
        a <- names; b <- names if a < b && lev(a, b) == 1
      } yield (a, b)
      val banded = for {
        a <- names; b <- names
        if a < b && (neighborhood(a) & neighborhood(b)).nonEmpty &&
          lev(a, b) == 1
      } yield (a, b)
      assert(banded.sorted == brute.sorted, names.mkString(","))
    }
  }
}
