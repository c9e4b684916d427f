package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized oracle test for the general CDC apply: many small random
  * (base, changeset) instances vs an independent in-memory reference
  * fold. Pins the full op lattice — delete-after-update, insert-then-
  * delete, partial (null-payload) updates, upserts on unseen keys,
  * untouched keys — beyond what the fixture changeset exercises. */
class CdcProps extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // base row: key -> (a, b); change: (key, op, aOpt, bOpt, seq)
  private def reference(base: Map[Long, (String, Double)],
      changes: Seq[(Long, String, Option[String], Option[Double], Long)])
      : Map[Long, (Option[String], Option[Double])] = {
    val latest = changes.groupBy(_._1).map { case (k, cs) => k -> cs.maxBy(_._5) }
    val applied = scala.collection.mutable.Map[Long, (Option[String], Option[Double])]()
    base.foreach { case (k, (a, b)) => applied(k) = (Some(a), Some(b)) }
    latest.values.foreach { case (k, op, ao, bo, _) =>
      if (op == "D") applied.remove(k)
      else applied.get(k) match {
        case Some((a0, b0)) => applied(k) = (ao.orElse(a0), bo.orElse(b0))
        case None => applied(k) = (ao, bo)
      }
    }
    applied.toMap
  }

  test("applyChanges == reference fold on 60 random instances") {
    import spark.implicits._
    val rng = new scala.util.Random(2024)
    for (trial <- 0 until 60) {
      val baseKeys = (0L until (1 + rng.nextInt(12))).toSeq
      val base = baseKeys.map(k =>
        k -> (s"s${rng.nextInt(3)}", rng.nextInt(100).toDouble)).toMap
      val nChanges = rng.nextInt(20)
      // per-key unique seq (the operator's documented precondition)
      val seqCounter = scala.collection.mutable.Map[Long, Long]()
      val changes = (0 until nChanges).map { _ =>
        val k = rng.nextInt(16).toLong // may miss base — insert path
        val op = Seq("U", "D", "I")(rng.nextInt(3))
        val ao = if (rng.nextBoolean()) Some(s"s${rng.nextInt(3)}") else None
        val bo = if (rng.nextBoolean()) Some(rng.nextInt(100).toDouble) else None
        val seq = seqCounter.updateWith(k)(v => Some(v.getOrElse(0L) + 1)).get
        (k, op, if (op == "D") None else ao, if (op == "D") None else bo, seq)
      }
      val want = reference(base, changes)
      val baseDf = base.toSeq.map { case (k, (a, b)) => (k, a, b) }
        .toDF("k", "a", "b")
      val changesDf = changes.toDF("k", "op", "a", "b", "seq")
      val got = Cdc.applyChanges(baseDf, changesDf, "k").collect()
        .map(r => r.getAs[Long]("k") ->
          ((Option(r.getAs[String]("a")), Option(r.getAs[java.lang.Double]("b"))
            .map(_.toDouble)))).toMap
      assert(got == want,
        s"trial $trial\nbase=$base\nchanges=$changes\ngot=$got\nwant=$want")
    }
  }

  test("NULL-keyed base rows survive untouched (not misread as inserts)") {
    import spark.implicits._
    // ADVICE r4: presence was detected via base(key).isNull after the
    // full-outer join, so a NULL-keyed base row (which never joins) was
    // classified as an insert and its payload silently wiped to the
    // (null) change-side values. The sentinel-column fix keeps it intact.
    val base = Seq((Option(1L), "x", 1.0), (Option.empty[Long], "keepme", 2.0))
      .toDF("k", "a", "b")
    val changes = Seq(
      (1L, "U", Option("y"), Option.empty[Double], 1L),
      (5L, "I", Option("new"), Option(9.0), 1L)).toDF("k", "op", "a", "b", "seq")
    val got = Cdc.applyChanges(base, changes, "k").collect()
    assert(got.length == 3)
    val nullKeyed = got.find(_.isNullAt(got.head.fieldIndex("k"))).get
    assert(nullKeyed.getAs[String]("a") == "keepme")
    assert(nullKeyed.getAs[Double]("b") == 2.0)
    val updated = got.find(r => !r.isNullAt(0) && r.getAs[Long]("k") == 1L).get
    assert(updated.getAs[String]("a") == "y" && updated.getAs[Double]("b") == 1.0)
    val inserted = got.find(r => !r.isNullAt(0) && r.getAs[Long]("k") == 5L).get
    assert(inserted.getAs[String]("a") == "new" && inserted.getAs[Double]("b") == 9.0)
  }

  test("NULL op means upsert on existing keys too (contract: anything " +
      "but 'D' is an upsert)") {
    import spark.implicits._
    // change-side presence was inferred from __op.isNotNull, so a
    // null-op change UPSERTED new keys but silently NO-OPED existing
    // ones; the change-side sentinel (__cp) fixes the asymmetry
    val base = Seq((1L, "old", 1.0)).toDF("k", "a", "b")
    val changes = Seq(
      (1L, Option.empty[String], Option("upd"), Option(5.0), 1L),
      (2L, Option.empty[String], Option("ins"), Option(9.0), 1L))
      .toDF("k", "op", "a", "b", "seq")
    val got = Cdc.applyChanges(base, changes, "k").collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("a"), r.getAs[Double]("b")))).toMap
    assert(got == Map(1L -> (("upd", 5.0)), 2L -> (("ins", 9.0))),
      s"null-op change must upsert both keys: $got")
  }
}
