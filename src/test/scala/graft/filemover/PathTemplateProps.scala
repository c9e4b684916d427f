package graft.filemover

import org.apache.hadoop.fs.Path
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure planning layer (SURVEY.md §5.2.1).
  * Uses scalacheck generators with explicit seeds (deterministic) and
  * plain scalatest assertions — the scalatestplus bridge isn't in the
  * offline dependency set.
  */
class PathTemplateProps extends AnyFunSuite {

  private val varName = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val litChunk = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
    Gen.oneOf('-', '_', '.'))).map(_.mkString)

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("render substitutes every variable and keeps literals") {
    for (((v, pre), post) <- samples(varName).zip(samples(litChunk)).zip(samples(litChunk))) {
      val t = PathTemplate.parse(s"$pre$$$v/$post")
      val r = t.render(Map(v -> "VAL"))
      assert(r == Vector(s"${pre}VAL", post), s"template $pre$$$v/$post")
    }
  }

  test("variable grammar stops at non-alphanumerics (underscore is literal)") {
    val t = PathTemplate.parse("cat_$category_id_$id.csv")
    assert(t.variables == Set("category", "id"))
    assert(t.render(Map("category" -> "C", "id" -> "7")) == Vector("cat_C_id_7.csv"))
  }

  test("unknown variable throws NoSuchElementException naming it") {
    val t = PathTemplate.parse("$outputDirectory/cat_$missing.csv")
    val e = intercept[NoSuchElementException] {
      t.render(Map("outputDirectory" -> "/out"))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("collision gate is all-or-nothing for any duplicate target") {
    for (n <- 2 to 20) {
      val files = (0 until n).map(i => new Path(s"/out/part-$i.csv"))
      val t = PathTemplate.parse("$outputDirectory/same.csv")
      assert(RenamePlanner.plan(files, t, new Path("/"), new Path("/out")).isEmpty)
    }
  }

  test("distinct targets all move") {
    val files = (0 until 5).map(i => new Path(s"/out/k=$i/part-0.csv"))
    val t = PathTemplate.parse("$outputDirectory/f_$k.csv")
    val plan = RenamePlanner.plan(files, t, new Path("/"), new Path("/out"))
    assert(plan.size == 5)
    assert(plan.map(_._2.getName).toSet == (0 until 5).map(i => s"f_$i.csv").toSet)
  }

  test("partition extraction: deeper directories win; value charset includes space/dash/underscore") {
    val f = new Path("/out/k=a/k=b/m=has space-and_more/part-0.csv")
    val got = RenamePlanner.partitionsOf(f)
    assert(got == Map("k" -> "b", "m" -> "has space-and_more"))
  }

  test("Hive null placeholder is captured as a partition value") {
    val f = new Path("/out/cat=__HIVE_DEFAULT_PARTITION__/part-0.csv")
    assert(RenamePlanner.partitionsOf(f) == Map("cat" -> "__HIVE_DEFAULT_PARTITION__"))
  }
}
